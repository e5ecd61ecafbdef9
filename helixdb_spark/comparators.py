"""Pluggable key ordering for scans — the reference's ``Comparator`` trait
(reference src/util.rs:21-109).

In Spark an ordering is just an expression handed to ``orderBy``, so a
comparator here is a function ``key_col -> sort_col``:

- ``lexical`` — bytewise order, the reference's ``LexicalComparator``
  (util.rs:21-53); Spark's natural BinaryType ordering is already bytewise
  unsigned-lexicographic, so this is the identity expression.
- ``no_order`` — the reference's ``NoOrderComparator`` (util.rs:54-80):
  everything compares Equal, i.e. an unordered full scan. We express it as
  "no sort column at all" which also removes the global sort exchange from
  the plan — the scale-friendly choice when order is not required.
- custom — any callable producing a derived sort expression (e.g. decode a
  little-endian u64 key and sort numerically).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

Comparator = Optional[Callable[[Column], Column]]


def lexical(key_col: Column) -> Column:
    return key_col


NO_ORDER: Comparator = None


def le_u64(key_col: Column) -> Column:
    """Sort 8-byte little-endian u64 keys numerically (the shape the
    reference's benchmark uses — reference benchmarks/src/main.rs:220-234).

    Works on the hex encoding (reversing the raw binary would round-trip it
    through a UTF-8 string and corrupt non-ASCII bytes): swap the 8 hex byte
    pairs into big-endian order, then parse base-16.
    """
    h = F.hex(key_col)
    swapped = F.concat(*[F.substring(h, i, 2) for i in (15, 13, 11, 9, 7, 5, 3, 1)])
    return F.conv(swapped, 16, 10).cast("decimal(20,0)")
