"""The bench stdout contract: the driver captures only a fixed-size
output tail, so bench.py's single JSON line must stay small no matter
how large the registry grows (round 3's full 90-query map outgrew the
tail and the official perf record was lost to truncation)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import compact_line  # noqa: E402

from skripsi_mapreduce_spark.plans import QUERIES  # noqa: E402


def test_compact_line_under_2kb_at_worst_case():
    """Worst case against the REAL registry: every entry present, the 10
    longest names as the slowest (longest keys survive the top-10 cut),
    five-digit timings with full fractional width."""
    names = sorted(QUERIES, key=len, reverse=True)
    timings = {n: 0.1234 for n in QUERIES}
    for n in names[:10]:
        timings[n] = 86399.9876  # worst-width value, longest names win
    line = compact_line(timings, 0.1)
    assert len(line.encode()) < 2048, len(line.encode())
    assert "\n" not in line


def test_compact_line_is_parseable_and_complete():
    timings = {n: 1.0 for n in QUERIES}
    d = json.loads(compact_line(timings, 0.1))
    assert d["metric"] == "declared_queries_total_wall"
    assert d["n_queries"] == len(QUERIES)
    assert len(d["queries"]) == 10
    assert d["value"] == len(QUERIES) * 1.0
    assert d["unit"] == "sec" and d["sf"] == 0.1


def test_compact_line_size_headroom_for_growth():
    """Even a 400-entry registry with long names must fit: the line size
    is bounded by the top-10 map, not the registry size."""
    fake = {f"very_long_entry_name_for_growth_headroom_{i:03d}": 12345.6789
            for i in range(400)}
    line = compact_line(fake, 1.0)
    assert len(line.encode()) < 2048, len(line.encode())
