"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.01 and compare against oracle_sql() via DuckDB
(row count + sorted-column value comparison, order-insensitive)."""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

# default mirrors the driver gate (sf0.01); override to re-verify the
# whole oracle surface at another scale, e.g.
#   HLL_SPARK_SF_DIR=/root/testdata/sf0.1 pytest tests/test_entry_contract.py
SF = os.environ.get("HLL_SPARK_SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return math.isclose(fa, fb, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "distinct_text" in df.columns


def test_all_queries_have_unique_names():
    qs = entry_mod.queries()
    assert len(qs) >= 20
    missing = set(entry_mod.oracle_sql()) - set(qs)
    assert not missing, f"oracle without query: {missing}"


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, oracle_con, name):
    q = entry_mod.queries()[name]
    got = q(spark, SF).toPandas()
    expected = oracle_con.sql(entry_mod.oracle_sql()[name]).df()
    assert sorted(got.columns) == sorted(expected.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(expected.columns)}"
    )
    assert len(got) == len(expected), f"{name}: {len(got)} vs {len(expected)} rows"
    g, e = normalize(got), normalize(expected)
    for col in g.columns:
        for i, (a, b) in enumerate(zip(g[col], e[col])):
            assert values_equal(a, b), f"{name}.{col} row {i}: {a!r} != {b!r}"


NO_ORACLE = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) >= 1


# The rounds the CURRENT window was built against. Pinned (not
# globbed) so the invariant does not self-invalidate the moment the
# driver writes the CURRENT round's CORRECTNESS file (the r4 lesson:
# globbing ALL CORRECTNESS_r*.json made every in-window query "seen"
# as soon as CORRECTNESS_r04.json landed). Bump this set together
# with the queries() reorder at the start of each round.
WINDOW_BUILT_AGAINST_ROUNDS = {1, 2, 3, 4}

# The 24 re-verify slots of the r5 window (positions 27-50), pinned
# EXACTLY: the two rows whose gate changed this round, the r2-era
# ORACLE rows (oldest driver evidence), and the highest-traffic
# r3-green operators. Any drift — an insertion pushing one out, or an
# unplanned already-checked query taking a slot — fails the test.
REVERIFY_BACKFILL = [
    "curate_corpus_docs",
    "semdedup_keep_embeddings",
    "exact_quantiles_price",
    "session_counts",
    "setop_partkeys_except",
    "asof_last_order",
    "pricing_summary",
    "join_mktsegment_orders",
    "window_top_order_per_cust",
    "customers_without_orders",
    "rollup_user_counts",
    "json_props_stats",
    "media_metadata_documents",
    "extract_text_pages",
    "extract_text_pages_arrow",
    "streaming_sink_distinct",
    "mg_top_sources",
    "minhash_dedup_parity",
    "hll_users_salted",
    "checkpoint_resume_estimate",
    "hll_users_by_event_type",
    "cms_event_type_counts",
    "bloom_fk_prefilter",
]


def test_never_driver_checked_queries_sit_in_the_driver_window():
    # The driver evaluates only the FIRST 50 queries() entries per
    # round; the rotation contract (VERDICT r3 #1) is that any query
    # with no CORRECTNESS row in any PRIOR round must be inside that
    # window. This pins the invariant so a future insertion can't
    # silently push a never-checked query past the cap.
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for r in WINDOW_BUILT_AGAINST_ROUNDS:
        path = os.path.join(repo, f"CORRECTNESS_r{r:02d}.json")
        try:
            seen |= set(json.load(open(path)).keys())
        except Exception:
            continue
    assert seen, "no CORRECTNESS rows found for the pinned rounds"

    names = list(entry_mod.queries().keys())
    never = [q for q in names if q not in seen]
    # Every never-checked query leads the window (r5: exactly the 26
    # late-r4 deferrals, VERDICT r4 next-round #1).
    assert never == names[: len(never)], (
        f"never-driver-checked queries must occupy the leading window "
        f"slots; got positions "
        f"{[(q, names.index(q)) for q in never if names.index(q) >= len(never)]}"
    )
    assert len(never) <= 50, (
        f"{len(never)} never-checked queries exceed the 50-slot window"
    )
    # The remaining window slots are the pinned re-verify backfill.
    backfill = names[len(never):50]
    assert backfill == REVERIFY_BACKFILL, (
        f"re-verify window slots drifted from the pinned list: "
        f"{backfill} != {REVERIFY_BACKFILL}"
    )
