"""Plan-quality gates over every driver query (BENCH/BASELINE.md §5).

At 100 TB the plan shape IS the performance model, so these are hard
assertions, not docs: no query may plan a cartesian/nested-loop join,
filtered parquet scans must show pushed filters, and single-column
reads must prune the schema.
"""

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"

# queries whose plans we gate (skip the ones that pre-collect internally:
# cms/bloom/ann broadcast a driver-built blob by design, and the sketch
# union/intersect queries join two ONE-ROW frames where a cross join is
# the correct plan)
GATED = [
    "hll_users_by_event_type",
    "hll_custkey_by_month",
    "hll_flagship_distinct_text",
    "hll_distinct_order_part_pairs",
    "hll_users_salted",
    "exact_dedup_documents",
    "duplicate_groups_documents",
    "embedding_dup_pairs",
    "minhash_pairs_documents",
    "simhash_pairs_documents",
    "ngram_jaccard_pairs",
    "token_counts_documents",
    "text_quality_documents",
    "lang_id_documents",
    "fingerprint_documents",
    "media_metadata_documents",
    "media_features_documents",
    "pricing_summary",
    "join_mktsegment_orders",
    "window_top_order_per_cust",
    "customers_without_orders",
    "rollup_user_counts",
    "setop_partkeys_except",
    "asof_last_order",
    "session_counts",
    # round-3 additions
    "theta_estimate_orderkeys",
    "embedding_dup_pairs_tight",
    "minhash_dedup_parity",
    "decoded_media_stats",
    "mg_top_sources",
    "strip_boilerplate_docs",
    "range_join_value_bands",  # the whole point: no nested loop
    "customers_with_orders_semi",
    "window_event_neighbors",
    "cube_event_stats",
    "unpivot_doc_metrics",
    "pivot_event_type_by_cohort",
    "distinct_urls_by_host",
    "normalize_urls_docs",
    "extract_text_pages",
    "extract_text_pages_arrow",
    # round-4 additions
    "minhash_pairs_parity",
    "simhash_pairs_parity",
    "minhash_join_parity",  # cross-corpus banded bucket join, hash only
    "dedup_increment_parity",  # minhash_join + left_anti hash join
    # (paragraph_dedup_parity and decontaminate_documents are excluded
    # like cms/bloom: each cross-joins ONE deliberately-1-row broadcast
    # frame — the shared-paragraph / collected-snippet-array scaffold —
    # where a broadcast NLJ of one row is the correct plan; the
    # underlying operators are join-free / hash-join only)
    "decontaminate_ngrams",
    "consistent_sample_parity",  # pure codegen filter scan
    "temperature_resample_docs",  # tiny-agg + broadcast hash join back
    # crawl-ledger ops (continuation session)
    "latest_crawl_parity",  # one hash aggregate, no window sort
    "blocklist_filter_parity",  # arrays_overlap codegen filter
    "cap_per_host_parity",  # counts join + hash-prefilter + window
    "repetition_metrics_documents",  # pure JVM array lambdas
    "window_distinct_users_daily",  # window() bucketing + HLL scaffold
    "window_distinct_users_hopping",  # window(slide) + HLL scaffold
    "crawl_ingest_parity",  # the composed ingest chain stays NLJ-free
    # (theta_jaccard_partkeys excluded like the other theta queries:
    # the 1-row sketch-pair crossJoin is the correct plan)
    # late-r4 additions
    "repeated_span_stats",  # one gram window + hash joins only
    "remove_repeated_spans",  # same shuffle shape as the stats half
    "decontaminate_bloom",  # bitmap probe + hash verify join
    "weighted_sample_docs",  # TakeOrderedAndProject, no global sort
    "top_vocab",  # one hash aggregate + TakeOrderedAndProject
    "stratified_split_docs",  # md5-rank windows, no joins
    "kll_range_buckets_price",  # literal-array bucket filter + hash agg
    "normalize_unicode_docs",  # one Arrow-batched projection, no joins
    "semdedup_parity",  # mapInPandas assign + cell-grouped prune, join-free
    "lm_perplexity_documents",  # broadcast hash joins + map-side-combined aggs
    "dsir_importance_documents",  # same shape, two broadcast model sides
    "shard_manifest_documents",  # one codegen projection + hash aggregate
    "char_entropy_documents",  # one Arrow-batched projection, no joins
    # (tfidf_top_terms excluded like decontaminate_documents: its only
    # cross join broadcasts the deliberately-1-row corpus-count frame)
    # (quality_classifier_parity excluded for the same reason: the
    # bias rides a broadcast 1-row crossJoin; every model join is a
    # broadcast HASH join on feat)
    "token_budget_selection",  # range shuffle + mapInPandas, join-free
    # closing-r4 additions
    "budget_mixture_by_lang",  # same pruned scan, grouped
    "fd_gram_by_label",  # per-group blob build + applyInPandas merge
    "profile_orders_columns",  # one mapInArrow scan + per-column merge
    "fk_discovery_tpch",  # per-column sketch scans + broadcast pair join
    "hll_overlap_events",  # ONE grouped build + single-task pair emit
    "theta_overlap_orders",  # same shape, theta DIRECT intersections
    "chunk_documents",  # pure-JVM generator projection, zero shuffles
    "salted_join_brand_volume",  # hot/cold split: hash joins only
    "image_dup_pairs_parity",  # dhash banding: chunk equality self-join
    "audio_dup_pairs_parity",  # same banding shape over WAV energy hash
    "warc_ingest_parity",  # one mapInPandas parse pass, no joins
    "host_pagerank_parity",  # hash joins + map-side sums per iteration
    "robots_filter_parity",  # rules hash join + max-struct election
    "pseudonymize_docs",  # pure codegen projection
    "k_anonymity_orders",  # two-level hash aggregate
    "split_sentences_docs",  # regexp_extract_all + posexplode, no joins
    "page_meta_parity",  # four codegen regexp_extract's
    "warc_corpus_parity",  # parse pass + codegen filter/extract chain
    "fix_mojibake_parity",  # one Arrow-batched projection, no joins
    "anchor_texts_parity",  # dual-group regexp zip + hash aggregate
    "corpus_diff_orders",  # ONE full-outer hash join + single aggregate
    "sliding_distinct_users",  # mapInArrow partials + grouped merges, join-free
    "kmeans_clusters_embeddings",  # one Arrow-batched assign + hash aggregate
    # (sliding_distinct_by_type excluded like the theta/cms queries:
    # its only cross join broadcasts the deliberately-1-row global
    # anchor frame against the per-group blob frame)
    # (bm25_retrieval_documents excluded like tfidf_top_terms: its only
    # nested loop broadcasts the deliberately-1-row corpus-stats frame;
    # test_retrieval.py asserts exactly one NLJ and >= 3 broadcast HASH
    # joins on the same plan)
]


def _plan(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", GATED)
def test_no_cartesian_or_nested_loop(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, name
    assert "BroadcastNestedLoopJoin" not in plan, name


def test_filter_pushdown_reaches_scan(spark):
    docs = entry_mod._t(spark, SF, "documents")
    plan = (
        docs.where(F.col("lang") == "en")
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "lang" in plan


def test_column_pruning_reaches_scan(spark):
    # a 1-column projection must not read the whole documents schema
    plan = _plan(spark, "token_counts_documents")
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" in read_schema and "doc_id" in read_schema
    assert "media" not in read_schema and "lang" not in read_schema


def test_whole_stage_codegen_in_relational_queries(spark):
    # AQE reveals codegen only in the FINAL plan (shown as the "*(n)"
    # stage-id prefix in the compact string), so execute first
    for name in ("pricing_summary", "join_mktsegment_orders"):
        df = entry_mod.queries()[name](spark, SF)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan and "*(" in plan, name


def test_broadcast_join_for_small_dimension(spark):
    plan = _plan(spark, "join_mktsegment_orders")
    assert "BroadcastHashJoin" in plan
