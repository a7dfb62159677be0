"""Unit test for bench.py's paired interleaved regression protocol
(VERDICT r11 #3): a reported regression must carry method="interleaved";
host_factor_only may only settle flags that normalization clears."""

from __future__ import annotations

import bench


def test_paired_recheck_interleaves_all_still_hot_flags(spark):
    def thunk(s, _sf):
        return s.range(5).toDF("id")

    names = [f"q{i}" for i in range(12)]
    queries = {n: thunk for n in names}
    # global host drift 1.25x on the 9 baseline queries (unflagged);
    # q0 raw 4.0 (worst, capped-interleave), q1 raw 2.0 (beyond the cap
    # but still 1.6x after normalization -> MUST interleave), q2 raw 1.5
    # (1.2x after normalization -> cleared, host_factor_only is fine)
    ref = {"ts": 1, "queries": {n: 1.0 for n in names}}
    timings = {n: 1.25 for n in names}
    timings["q0"], timings["q1"], timings["q2"] = 4.0, 2.0, 1.5

    out = bench._paired_recheck(
        spark, "/root/testdata/sf0.001", queries, timings, ref,
        threshold=1.3, max_flagged=1, reps=1, n_anchors=2,
    )
    assert out["status"] == "ok"
    assert out["flagged"]["q0"]["method"] == "interleaved"
    assert out["flagged"]["q1"]["method"] == "interleaved"
    assert out["flagged"]["q2"]["method"] == "host_factor_only"
    # the core invariant: nothing above threshold settles un-interleaved
    for q, v in out["flagged"].items():
        if v["method"] == "host_factor_only":
            assert v["paired_ratio"] <= 1.3, (q, v)
