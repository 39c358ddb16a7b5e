"""The bench final stdout line must stay driver-parseable forever.

The driver's tail capture keeps only the last ~2,000 chars of bench.py
output; round 5's 75-query map grew the final JSON line to 2,283 chars
and BENCH_r05.json came back ``parsed: null``. bench.compact_line caps
the embedded per-query map at the 5 slowest entries — these tests pin
that the serialized line stays under budget no matter how many queries
the headline set grows to.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402


def _fake_timings(n: int) -> dict:
    # worst-case realistic name lengths (longest current registry name
    # is ~30 chars) and float timings with full repr noise
    return {
        f"extremely_long_query_name_number_{i:04d}": round(0.001 * i + 0.123, 3)
        for i in range(n)
    }


def test_compact_line_under_budget_at_500_queries():
    line = json.dumps(bench.compact_line(_fake_timings(500), 0.1, 1_234_567))
    assert len(line) < bench.COMPACT_LINE_BUDGET, len(line)


def test_compact_line_under_budget_small():
    line = json.dumps(bench.compact_line(_fake_timings(3), 0.01, 0))
    assert len(line) < bench.COMPACT_LINE_BUDGET, len(line)


def test_compact_line_schema_and_worst5():
    timings = _fake_timings(50)
    out = bench.compact_line(timings, 0.1, 42)
    assert out["metric"] == "headline_queries_total"
    assert out["unit"] == "sec"
    assert out["value"] == round(sum(timings.values()), 3)
    assert out["n_queries"] == 50
    assert out["sf"] == 0.1
    assert out["streaming_windowed_rows_per_sec"] == 42
    assert len(out["queries"]) == 5
    # the embedded map is exactly the 5 slowest queries
    top5 = sorted(timings.values(), reverse=True)[:5]
    assert sorted(out["queries"].values(), reverse=True) == top5


def test_headline_names_all_registered():
    from etl_weather_spark import queries as q

    registry = q.queries()
    missing = [n for n in bench.HEADLINE if n not in registry]
    assert not missing, missing
