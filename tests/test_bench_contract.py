"""Driver-contract invariants of bench.py's stdout line (no Spark
session needed): the correctness driver keeps only the last 2000 chars
of stdout and parses the final line — rounds 1-2 recorded parsed=null
because the JSON line outgrew that window."""

import json

from bench import shed_to_fit


def _line_out(n_extra: int = 0) -> dict:
    base = {
        "metric": "workload_wall_time",
        "value": 12.34,
        "unit": "sec",
        "sf": 0.1,
        "oracle_subset_sec": 10.0,
        "pipeline_subset_sec": 2.34,
        "n_queries": n_extra,
        "failed": [],
        "detail": "BENCH_DETAIL.json",
        "crossover_r03": {"0.1": 4.3, "1": 2.45, "10": 1.31},
    }
    return base


def test_small_payload_keeps_every_query():
    timings = {f"q{i:02d}_name": 0.5 + i for i in range(10)}
    line = shed_to_fit(_line_out(10), timings)
    parsed = json.loads(line)
    assert len(line) <= 1800
    assert set(parsed["queries"]) == set(timings)


def test_large_payload_sheds_fastest_first():
    timings = {f"q{i:03d}_some_rather_long_query_name": float(i) for i in range(200)}
    line = shed_to_fit(_line_out(200), timings)
    parsed = json.loads(line)
    assert len(line) <= 1800
    kept = parsed["queries"]
    assert 0 < len(kept) < 200
    # the slowest entries survive; the shed ones are the fastest
    slowest = max(timings, key=timings.get)
    assert slowest in kept
    assert min(timings[k] for k in kept) >= max(
        timings[k] for k in timings if k not in kept
    )


def test_all_failed_still_produces_valid_line():
    timings = {"q01_x": -1.0, "q02_y": -1.0}
    line = shed_to_fit(_line_out(2), timings)
    parsed = json.loads(line)
    assert parsed["queries"] == {}
    assert len(line) <= 1800


def test_headline_fields_never_shed():
    timings = {f"q{i:03d}_very_long_query_name_padding_xx": float(i) for i in range(500)}
    line = shed_to_fit(_line_out(500), timings)
    parsed = json.loads(line)
    for field in ("metric", "value", "unit", "sf", "oracle_subset_sec",
                  "pipeline_subset_sec", "failed", "detail"):
        assert field in parsed
