#!/usr/bin/env python3
"""Synthesize an sf1 (10x sf0.1) dataset for scale-exponent measurement.

The driver ships sf{0.001,0.01,0.1} only; the round-7 verdict asks for
scale-up evidence the sf0.1 bench structurally cannot give (task #4). This
derives sf1 FROM sf0.1 (never touching /root/testdata) by unioning 10
key-shifted copies per table:

* every copy is a self-consistent shard of the universe — foreign keys are
  shifted by the same stride on both sides, so joins stay 10x, never 100x;
* documents get a per-copy text suffix so cross-copy rows are not exact or
  near duplicates (a 10-clone corpus would inflate candidate pairs 100x
  and measure the clone structure, not the scale);
* embeddings rotate their dimensions per copy (a norm-preserving
  permutation: cluster geometry per copy survives, cross-copy exact dups
  don't);
* events keep their time span (a busier week, not a longer one — the
  bucket count and watermark arithmetic stay the sf0.1 shape, row density
  grows 10x, which is how real traffic scales);
* nation/region stay single copies (dimension tables).

Usage: python scripts/make_sf1.py [SRC] [DST]   (defaults below)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/tmp/testdata_sf1"
COPIES = int(os.environ.get("SF1_COPIES", "10"))

# key strides: comfortably above each table's max id at sf0.1
STRIDE = {
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "o_orderkey": 10_000_000,
    "o_custkey": 1_000_000,
    "c_custkey": 1_000_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    # suppkey stride kept small enough that supplier graph-node ids stay
    # below plans/tpch.CUST_NODE_OFFSET (1_000_000) at 10 copies
    "l_suppkey": 50_000,
    "s_suppkey": 50_000,
    "p_partkey": 1_000_000,
}


def main() -> None:
    from pyspark.sql import functions as F

    from helixdb_spark.session import get_session

    spark = get_session("make_sf1")
    os.makedirs(DST, exist_ok=True)

    def shifted(df, i: int, keys: list[str]):
        out = df
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.lit(i * STRIDE[k]))
        return out

    def write(name: str, build) -> None:
        dst = f"{DST}/{name}.parquet"
        if os.path.exists(dst):
            print(f"{name}: exists, skipping")
            return
        src = spark.read.parquet(f"{SRC}/{name}.parquet")
        parts = [build(src, i) for i in range(COPIES)]
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        tmp = f"{DST}/_tmp_{name}"
        df.write.mode("overwrite").parquet(tmp)
        os.rename(tmp, dst)
        n = spark.read.parquet(dst).count()
        print(f"{name}: {n} rows")

    # dimension tables: byte-for-byte copies
    for name in ("nation", "region"):
        write(name, lambda df, i: df if i == 0 else df.limit(0))

    write(
        "documents",
        lambda df, i: df
        if i == 0
        else shifted(df, i, ["doc_id"]).withColumn(
            "text",
            F.concat(
                F.col("text"),
                F.lit(f" shard{i}x"),
                (F.col("doc_id") % 97).cast("string"),
            ),
        ),
    )

    dim = 64

    def rot_emb(df, i):
        if i == 0:
            return df
        rot = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: F.element_at("embedding", (j + F.lit(i)) % dim + 1),
        )
        return shifted(df, i, ["vec_id"]).withColumn("embedding", rot)

    write("embeddings", rot_emb)
    write(
        "events",
        lambda df, i: df if i == 0 else shifted(df, i, ["event_id", "user_id"]),
    )
    write(
        "orders",
        lambda df, i: df
        if i == 0
        else shifted(df, i, ["o_orderkey", "o_custkey"]),
    )
    write(
        "lineitem",
        lambda df, i: df
        if i == 0
        else shifted(df, i, ["l_orderkey", "l_partkey", "l_suppkey"]),
    )
    write(
        "customer",
        lambda df, i: df if i == 0 else shifted(df, i, ["c_custkey"]),
    )
    write(
        "supplier",
        lambda df, i: df if i == 0 else shifted(df, i, ["s_suppkey"]),
    )
    write(
        "part",
        lambda df, i: df if i == 0 else shifted(df, i, ["p_partkey"]),
    )
    print(f"sf1 dataset ready at {DST}")


if __name__ == "__main__":
    main()
