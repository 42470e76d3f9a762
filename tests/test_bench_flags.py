"""Shuffle-rows regression flags (r6 verdict item 2): deterministic,
host-independent plan-change detection in bench.py. The end-to-end signal
is demonstrated in SCALE.md (q5 with broadcasts disabled: 5 -> 750,040
rows, flagged); these pin the flag function's contract."""

from __future__ import annotations

from bench import shuffle_row_flags


def test_flags_on_large_relative_growth():
    got = shuffle_row_flags(
        {"q": 750_040}, {"q": 5}
    )
    assert len(got) == 1 and got[0]["query"] == "q"


def test_no_flag_inside_tolerance():
    # +10% exactly, and small absolute growth under the 1k floor
    assert shuffle_row_flags({"a": 110, "b": 900}, {"a": 100, "b": 500}) == []


def test_no_flag_without_baseline_entry():
    # a query new this round has no baseline rows yet -> skipped, not flagged
    assert shuffle_row_flags({"new_q": 10_000_000}, {}) == []


def test_failed_runs_never_flag():
    # -1 marks a failed measurement on either side
    assert shuffle_row_flags({"q": -1}, {"q": 5}) == []
    assert shuffle_row_flags({"q": 10_000_000}, {"q": -1}) == []


def test_flags_sorted_by_absolute_growth():
    got = shuffle_row_flags(
        {"small": 20_000, "big": 5_000_000},
        {"small": 10_000, "big": 1_000_000},
    )
    assert [f["query"] for f in got] == ["big", "small"]


def test_snap_absorbs_probe_jitter():
    from bench import snap_shuffle_pins

    # memoized-probe jitter (0 <-> 64) snaps back to the committed pin
    assert snap_shuffle_pins({"lpa": 64}, {"lpa": 0}) == {"lpa": 0}
    assert snap_shuffle_pins({"lpa": 0}, {"lpa": 64}) == {"lpa": 64}


def test_snap_keeps_real_plan_changes():
    from bench import snap_shuffle_pins

    # beyond the 10% + 1k envelope the measured value must be recorded
    assert snap_shuffle_pins({"q": 12_000}, {"q": 10_000}) == {"q": 12_000}
    assert snap_shuffle_pins({"q": 5_000}, {"q": 10_000}) == {"q": 5_000}
    # inside the envelope (10% of a large pin) it snaps
    assert snap_shuffle_pins({"q": 104_000}, {"q": 100_000}) == {"q": 100_000}


def test_snap_skips_failed_and_unbaselined():
    from bench import snap_shuffle_pins

    assert snap_shuffle_pins({"q": -1}, {"q": 0}) == {"q": -1}
    assert snap_shuffle_pins({"new": 42}, {}) == {"new": 42}


def test_compact_stdout_line_fits_driver_tail_window():
    """r12 verdict item 2: the driver keeps only the LAST ~2000 chars of
    stdout and parses that — three rounds of BENCH_rN "parsed": null came
    from the full 178-query map overflowing the window. The compact line
    must fit the 1900-byte budget whole (registry-scale timing map, long
    names) and still carry the slowest queries."""
    import json

    from bench import METHODOLOGY, fit_compact_line

    timings = {f"some_fairly_long_query_name_{i:04d}": i / 100.0 for i in range(250)}
    compact = {
        "metric": METHODOLOGY, "value": 153.1, "unit": "sec", "sf": 0.1,
        "cpus": 32, "warmup_sec": 21.2, "n_queries": len(timings),
        "n_failed": 0, "failed": [], "baseline_total_sec": 153.112,
        "canary_ratio": 0.988, "n_retried": 2, "n_regressions": 1,
        "regressions": [
            {"query": "some_fairly_long_query_name_0249",
             "baseline_sec": 1.0, "sec": 2.49}
        ],
        "n_shuffle_regressions": 0, "artifact": "BENCH_SELF_r13.json",
        "queries": {},
    }
    line = fit_compact_line(compact, timings)
    assert len(line) <= 1900, len(line)
    doc = json.loads(line)
    # slowest-first and non-empty: the informative tail survived the cut
    assert doc["queries"]
    assert "some_fairly_long_query_name_0249" in doc["queries"]
    assert doc["value"] == 153.1 and doc["n_queries"] == 250
