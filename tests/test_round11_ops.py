"""Round 11 regression pins: the r10 ADVICE fixes (JPEG error taxonomy,
decode_image fallback routing, HITS empty-graph guard) plus the new
round-11 operators added later in the round."""

import numpy as np
import pytest


# ------------------------------------------------------------ JPEG advice
def test_jpeg_truncated_scan_raises_clean_valueerror():
    """ADVICE r10: truncated entropy streams must surface as
    ValueError('truncated JPEG scan'), not raw IndexError from
    _BitReader._fill or an escaped _EndOfScan."""
    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    good = encode_jpeg(arr, quality=90)
    # chop the tail off the entropy segment (keep headers intact)
    truncated = good[: len(good) // 2]
    with pytest.raises(ValueError, match="truncated JPEG scan"):
        decode_jpeg(truncated)
    # also: splice a premature EOI into the scan -> _EndOfScan path
    spliced = good[: len(good) - 20] + b"\xff\xd9"
    with pytest.raises(ValueError, match="truncated JPEG scan"):
        decode_jpeg(spliced)


def test_jpeg_four_component_raises_notimplemented():
    """ADVICE r10 (medium): 4-component Adobe CMYK/YCCK frames are
    valid-but-unsupported -> NotImplementedError (so decode_image falls
    through to PIL), never ValueError/IndexError."""
    from helixdb_spark.operators.jpeg import decode_jpeg, encode_jpeg

    arr = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = bytearray(encode_jpeg(arr, quality=90))
    # patch SOF0: find FFC0, length at +2 (2 bytes), precision +4,
    # h +5..6, w +7..8, nc at +9
    i = good.find(b"\xff\xc0")
    assert i > 0
    good[i + 9] = 4
    with pytest.raises(NotImplementedError, match="4 components"):
        decode_jpeg(bytes(good))


def test_decode_image_jpeg_valueerror_falls_through():
    """decode_image must not die on a JPEG payload the native decoder
    rejects with ValueError: it falls through to PIL, and without PIL the
    documented NotImplementedError surfaces (never a raw ValueError)."""
    from helixdb_spark.operators import multimodal as mm
    from helixdb_spark.operators.jpeg import encode_jpeg

    arr = np.full((8, 8, 3), 90, dtype=np.uint8)
    good = encode_jpeg(arr, quality=90)
    truncated = good[: len(good) // 2]
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        pytest.skip("PIL present: fallback decodes or raises PIL's error")
    with pytest.raises(NotImplementedError):
        mm.decode_image(truncated)


# ------------------------------------------------------- HITS empty graph
def test_hits_edgeless_graph_no_keyerror(spark):
    """ADVICE r10: totals['a']/totals['h'] KeyError when both score
    vectors are empty. An empty edge table must return an empty (or
    null-scored) result, not crash on the driver."""
    from helixdb_spark.operators.graph import hits

    edges = spark.createDataFrame([], "src string, dst string")
    out = hits(edges, iterations=2)
    assert out.count() == 0
    assert set(out.columns) == {"node", "hub", "authority"}
