"""Parity with the reference's reviewer test
(reference src/level.rs:734-753; FIXTURES.md F2)."""

from helixdb_spark.maintenance import Compact, Outdate, SimpleTimestampReviewer


def test_simple_timestamp_reviewer_trigger_compact_and_outdate():
    tsr = SimpleTimestampReviewer(rick_range=10, outdate_range=30)
    actions = []
    for i in range(40):
        actions.extend(tsr.observe(i))
    assert actions == [
        Compact(0, 9),
        Compact(10, 19),
        Compact(20, 29),
        Outdate(9),
        Compact(30, 39),
        Outdate(19),
    ]


def test_reviewer_state_roundtrip():
    tsr = SimpleTimestampReviewer(rick_range=10, outdate_range=30)
    for i in range(25):
        tsr.observe(i)
    revived = SimpleTimestampReviewer.from_state(tsr.to_state())
    assert revived.observe(29) == [Compact(20, 29), Outdate(9)]
