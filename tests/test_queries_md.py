"""QUERIES.md drift guard (VERDICT r3 #8).

The header counts and the per-query rows are hand-written prose; these
assertions chain them to ``__spark_entry__.queries()`` /
``oracle_sql()`` so they cannot silently drift: the header must state
the exact registered/oracle counts, every registered query must have a
table row, and each row's ORACLE / rows-only tag must match whether an
oracle_sql() entry exists.
"""

import re
from pathlib import Path

import __spark_entry__ as entry_mod

QUERIES_MD = Path(__file__).resolve().parents[1] / "QUERIES.md"


def test_header_counts_match_registration():
    head = QUERIES_MD.read_text().splitlines()[0]
    m = re.search(r"(\d+) queries, (\d+) with full DuckDB value oracles", head)
    assert m, f"QUERIES.md header lost its counts line: {head!r}"
    assert int(m.group(1)) == len(entry_mod.queries())
    assert int(m.group(2)) == len(entry_mod.oracle_sql())


def test_every_query_has_a_row_with_the_right_gate():
    text = QUERIES_MD.read_text()
    rows = {}
    for line in text.splitlines():
        m = re.match(r"\|\s*(\w+)\s*\|\s*(ORACLE|rows-only)\s*\|", line)
        if m:
            rows[m.group(1)] = m.group(2)
    qs = set(entry_mod.queries())
    oracles = set(entry_mod.oracle_sql())
    missing = qs - set(rows)
    assert not missing, f"queries without a QUERIES.md row: {sorted(missing)}"
    stale = set(rows) - qs
    assert not stale, f"QUERIES.md rows for unregistered queries: {sorted(stale)}"
    for name, gate in rows.items():
        want = "ORACLE" if name in oracles else "rows-only"
        assert gate == want, f"{name}: QUERIES.md says {gate}, registration says {want}"


def test_bench_times_every_registered_query():
    # bench.py's suite lists must stay chained to queries(): every
    # listed name registered, no duplicates across lists, and every
    # registered query timed except the documented exclusion
    # (streaming_sink_distinct's wall time is micro-batch machinery
    # startup, not data-volume work).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "bench", QUERIES_MD.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    timed = (
        bench.BASE_QUERIES
        + bench.EXTRA_QUERIES
        + bench.EXTRA_QUERIES_R3
        + bench.EXTRA_QUERIES_R4
        + bench.EXTRA_QUERIES_R4B
        + bench.EXTRA_QUERIES_R5
    )
    assert len(timed) == len(set(timed)), "duplicate bench query names"
    qs = set(entry_mod.queries())
    unknown = set(timed) - qs
    assert not unknown, f"bench times unregistered queries: {sorted(unknown)}"
    untimed = qs - set(timed)
    assert untimed == {"streaming_sink_distinct"}, (
        f"registered queries with no bench timing row: {sorted(untimed)}"
    )
