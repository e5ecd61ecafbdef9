"""Round 12 regression pins: the r11 VERDICT items — complete
dominant_script routing (arabic), char-n-gram shingles for space-free
scripts, NFKC invariants, CMYK/YCCK JPEG — plus the r11 ADVICE fixes
(fill-byte marker walk, epoch-replay guard, sized append coalesce)."""

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------------------------------------------- dominant_script (r11 #2)
def test_dominant_script_routes_arabic(spark):
    """r11 VERDICT #2 'Done' criterion: an Arabic-majority document must
    route to 'arabic' (pre-r12 the tie-break only considered
    han/cyrillic/latin, so Arabic-dominant docs fell through to 'latin'
    or 'none')."""
    from helixdb_spark.plans.pipeline import text_script_profile

    out = text_script_profile(spark, "/root/testdata/sf0.001")
    doms = {r["dominant_script"] for r in out.collect()}
    assert "arabic" in doms, doms
    # every profiled script must actually be reachable on the corpus
    assert {"latin", "cyrillic", "han", "arabic"} <= doms


def test_dominant_script_priority_chain(spark):
    """The fixed priority chain on hand-built fixtures: han > arabic >
    cyrillic > latin on ties, 'none' only when no profiled letters."""
    docs = [
        (0, "مرحبا بالعالم hi"),  # arabic-majority + some latin
        (1, "数据 مرحبا"),  # han == 2, arabic == 5 -> arabic
        (2, "数据数据 مر"),  # han 4 >= arabic 2 -> han
        (3, "Привет hi"),  # cyrillic 6 >= latin 2
        (4, "hello"),
        (5, "123 !?"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def cnt(prop):
        return F.regexp_count(F.col("text"), F.lit(prop))

    lat, cyr = cnt(r"\p{IsLatin}"), cnt(r"\p{IsCyrillic}")
    han, ara = cnt(r"\p{IsHan}"), cnt(r"\p{IsArabic}")
    dom = (
        F.when((han >= lat) & (han >= cyr) & (han >= ara) & (han > 0), "han")
        .when((ara >= lat) & (ara >= cyr) & (ara > 0), "arabic")
        .when((cyr >= lat) & (cyr > 0), "cyrillic")
        .when(lat > 0, "latin")
        .otherwise("none")
    )
    got = {
        r["doc_id"]: r["d"]
        for r in df.select("doc_id", dom.alias("d")).collect()
    }
    assert got == {
        0: "arabic",
        1: "arabic",
        2: "han",
        3: "cyrillic",
        4: "latin",
        5: "none",
    }
