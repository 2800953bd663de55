"""Benchmark harness — one JSON line on stdout (driver contract).

Default mode: runs the headline queries against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "docs_per_sec": ...}

The headline number additionally measures the flagship sketch-build
pipeline (synthetic web-pages table -> mapInPandas partial HLLs ->
two-level tree merge -> estimate) as docs/sec.

Scaling mode (``python bench.py --scaling``): reruns the flagship
pipeline in fresh subprocesses at local[N] and local[4N] (matching
shuffle partitions), interleaved, on the same input, and reports
throughput at both plus efficiency = (thr_4N/thr_N)/4 — the sandbox
protocol for the north rule's two-cluster-size criterion (see
BENCH/BASELINE.md for the level choice and steal-time measurement).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "16000000"))
PAGES_PATH = os.path.join(REPO, "_bench_cache", f"pages_{PAGES_ROWS}")


def make_spark(
    cpus: int,
    shuffle_partitions: int | None = None,
    ui: bool = False,
    arrow_batch: int = 131072,
    file_part_bytes: str = "64m",
):
    from pyspark.sql import SparkSession

    from hll_spark.session import apply_malloc_tunables, pin_jvm_heap

    # 12g pinned (Xms==Xmx, see pin_jvm_heap): big enough for every
    # suite query at sf0.1 with headroom, small enough that the one-off
    # first-touch cost stays bounded in degraded-fault windows
    builder = pin_jvm_heap(apply_malloc_tunables(SparkSession.builder), "12g")
    return (
        builder.master(f"local[{cpus}]")
        .appName("hll_spark-bench")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # the UI is enabled only in scaling children, where its REST API
        # provides the measured scan/shuffle byte volumes
        .config("spark.ui.enabled", "true" if ui else "false")
        .config("spark.sql.files.maxPartitionBytes", file_part_bytes)
        # default 128k rows/batch: measured best for the suite — an
        # attempted global 16k (8x more Python round-trips) slowed every
        # Arrow-UDF suite query 2-14x. The scaling child alone overrides
        # to 16k, where it was A/B-measured ~7% faster on the extraction
        # kernel (aligned with the hashing kernels' _CHUNK=16384) and
        # shrinks per-batch fresh-allocation exposure ~8x (free-page-
        # reporting host — see session.pin_jvm_heap)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .getOrCreate()
    )


def _io_snapshot(spark) -> dict[str, int]:
    """Cumulative completed-stage I/O volumes from the UI REST API:
    parquet scan bytes + shuffle read/write bytes. Subtracting two
    snapshots isolates one measured region — the evidence behind the
    'scan-bound, not engine-bound' scaling claim."""
    import json as _json
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = _json.load(r)
    return {
        "scan_bytes": sum(s.get("inputBytes", 0) for s in stages),
        "shuffle_read_bytes": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "shuffle_write_bytes": sum(s.get("shuffleWriteBytes", 0) for s in stages),
    }


def _tree_cpu_seconds() -> float:
    """Total accumulated CPU seconds (user+sys) of this process and
    every live descendant (the local-mode JVM and its reused Python
    workers), from /proc. Deltas of two snapshots give the CPU actually
    burned by a measured region — immune to hypervisor steal, and
    unlike Spark's executorCpuTime it INCLUDES the Python workers
    (where the murmur3/fused pipelines do their compute, while the JVM
    task thread blocks on the worker socket)."""
    import glob as _glob

    tick = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    children: dict[int, list[int]] = {}
    cpu: dict[int, float] = {}
    for stat in _glob.glob("/proc/[0-9]*/stat"):
        try:
            with open(stat) as f:
                data = f.read()
        except OSError:
            continue
        # pid (comm possibly with spaces) state ppid ... utime stime at 13,14
        rpar = data.rfind(")")
        fields = data[rpar + 2:].split()
        pid = int(data.split(" ", 1)[0])
        ppid = int(fields[1])
        cpu[pid] = (int(fields[11]) + int(fields[12])) / tick
        children.setdefault(ppid, []).append(pid)
    total, todo = 0.0, [me]
    while todo:
        p = todo.pop()
        total += cpu.get(p, 0.0)
        todo.extend(children.get(p, []))
    return total


# bump when generate_pages changes the bytes it emits (e.g. the html
# column format) — a cache built by an older fixture would otherwise be
# silently reused and make extraction numbers incomparable
PAGES_FIXTURE_VERSION = "2-wrap_html"


def ensure_pages(spark, n_rows: int = PAGES_ROWS, path: str = PAGES_PATH) -> str:
    """Materialize the deterministic synthetic pages table once (keyed
    by row count AND fixture version)."""
    import glob

    vfile = os.path.join(path, "_FIXTURE_VERSION")
    current = None
    if glob.glob(f"{path}/_SUCCESS"):
        try:
            with open(vfile) as fh:
                current = fh.read().strip()
        except OSError:
            current = None
    if current != PAGES_FIXTURE_VERSION:
        from hll_spark.sources.tables import generate_pages

        generate_pages(spark, n_rows, n_partitions=64).write.mode(
            "overwrite"
        ).parquet(path)
        with open(vfile, "w") as fh:
            fh.write(PAGES_FIXTURE_VERSION)
    return path


def flagship_docs_per_sec(
    spark, pages_path: str, hash_mode: str = "xxhash64"
) -> tuple[float, int, int]:
    """Flagship pipeline: distinct-url HLL at p=14 over the pages table.

    Returns (docs/sec, n_rows, estimate). Timing covers scan -> mapInPandas
    partial build -> tree merge -> estimate (the BASELINE.md protocol
    region); the parquet is pre-materialized so generation is excluded.
    """
    from pyspark.sql import functions as F

    from hll_spark.operators.agg import hll_sketch_agg, hll_estimate_udf
    from hll_spark.sketchlib.hll import HllConfig

    pages = spark.read.parquet(pages_path)
    t0 = time.perf_counter()
    row = (
        hll_sketch_agg(
            pages, "url", cfg=HllConfig(log2m=14, regwidth=5),
            hash_mode=hash_mode,
        )
        .withColumn("est", hll_estimate_udf()(F.col("sketch")))
        .select("est", "rows_seen")
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    return row["rows_seen"] / wall, row["rows_seen"], row["est"]


def extract_docs_per_sec(
    spark, pages_path: str, engine: str = "fused"
) -> tuple[float, int, int]:
    """North-star front half measured end-to-end: raw ``html: binary``
    -> text extraction -> distinct-TEXT HLL (p=14). This is the pipeline
    shape the north_star names (sketches are defined over the EXTRACTED
    text); unlike the url flagship the scan reads the wide html column,
    so this measures extraction + scan bandwidth, not just the sketch
    kernel.

    engine='fused' (headline): the Arrow batch kernel extracts, murmur3-
    hashes and updates HLL state in ONE Python pass per partition — only
    sketch blobs leave the workers (operators/extract.extract_sketch_agg).
    engine='jvm' (comparison): the pure column-expression regexp chain +
    JVM xxhash64 — zero Python, but the Java regex alternation is ~4.5x
    slower per core than the batch kernel on 1 KB pages.

    Returns (docs/sec, n_rows, estimate). Each call builds a fresh scan
    (new lineage), so timings are cold — no shuffle-stage reuse.
    """
    from pyspark.sql import functions as F

    from hll_spark.operators.agg import hll_sketch_agg, hll_estimate_udf
    from hll_spark.operators.extract import extract_sketch_agg, extract_text
    from hll_spark.sketchlib.hll import HllConfig

    cfg = HllConfig(log2m=14, regwidth=5)
    t0 = time.perf_counter()
    if engine == "fused":
        sk = extract_sketch_agg(spark.read.parquet(pages_path), "html", cfg=cfg)
    else:
        pages = spark.read.parquet(pages_path).select(
            extract_text("html").alias("etext")
        )
        sk = hll_sketch_agg(pages, "etext", cfg=cfg, hash_mode="xxhash64")
    row = (
        sk.withColumn("est", hll_estimate_udf()(F.col("sketch")))
        .select("est", "rows_seen")
        .collect()[0]
    )
    wall = time.perf_counter() - t0
    return row["rows_seen"] / wall, row["rows_seen"], row["est"]


# round-2 additions, timed identically but reported under
# "queries_extra" so the original 16-query total stays comparable
# across rounds. (embedding_dup_pairs was excluded here in r2/r3 while
# its plan was the quadratic LSH bucket join; since r4 it runs the
# blocked-GEMM exact plan and is timed under EXTRA_QUERIES_R4.)
EXTRA_QUERIES = [
    "ngram_jaccard_pairs",
    "theta_intersect_partkeys",
    "sketch_cube_slice",
    "lsh_ann_top3",
    "exact_quantiles_price",
    "json_props_stats",
    "consistent_sample_events",
    "pii_scrub_documents",
    "gopher_metrics_documents",
    "clean_corpus_stats",
]

# round-3 additions (same treatment). streaming_sink_distinct is
# excluded like embedding_dup_pairs: its wall time is micro-batch
# machinery startup (two full stream lifecycles per call), not
# data-volume work, so timing it at sf0.1 measures fixed overhead; it
# stays correctness-gated in CORRECTNESS/pytest.
EXTRA_QUERIES_R3 = [
    "extract_text_pages",
    "extract_text_pages_arrow",
    "normalize_urls_docs",
    "mg_top_sources_by_lang",
    "theta_estimate_orderkeys",
    "embedding_dup_pairs_tight",
    "minhash_dedup_parity",
    "decoded_media_stats",
    "mg_top_sources",
    "strip_boilerplate_docs",
    "clean_corpus_rep_parity",
    "distinct_sample_sources",
    "range_join_value_bands",
    "pivot_event_type_by_cohort",
    "unpivot_doc_metrics",
    "cube_event_stats",
    "window_event_neighbors",
    "distinct_urls_by_host",
]

# round-4 additions: the re-routed loose-threshold GEMM query (timeable
# now that it is no longer a quadratic bucket join), the two clone-corpus
# parity queries, and previously-untimed driver queries
EXTRA_QUERIES_R4 = [
    "embedding_dup_pairs",
    "minhash_pairs_parity",
    "simhash_pairs_parity",
    "media_metadata_documents",
    "customers_with_orders_semi",
    "asof_last_order",
    "session_counts",
    "rollup_user_counts",
    "paragraph_dedup_parity",
    "decontaminate_documents",
    "decontaminate_ngrams",
    "dup_connected_components",
    "ivf_ann_parity",
    "lsh_ann_parity",
    "kll_quantiles_exact",
    "skew_report_orders",
    "latest_crawl_parity",
    "blocklist_filter_parity",
    "cap_per_host_parity",
    "repetition_metrics_documents",
    "ams_join_size_orders",
    "join_plan_orders_lineitem",
    "theta_jaccard_partkeys",
    "window_distinct_users_daily",
    "crawl_ingest_parity",
    "repeated_span_stats",
    "remove_repeated_spans",
    "decontaminate_bloom",
    "top_vocab",
    "tfidf_top_terms",
    "stratified_split_docs",
    "bpe_merges_documents",
    "kll_range_buckets_price",
    "window_distinct_users_hopping",
    "normalize_unicode_docs",
    "lm_perplexity_documents",
    "dsir_importance_documents",
    "semdedup_parity",
    "shard_manifest_documents",
    "char_entropy_documents",
    "curate_corpus_docs",
    "weighted_sample_docs",
    "quality_classifier_parity",
    "token_budget_selection",
    "budget_mixture_by_lang",
    "fd_gram_by_label",
    "countsketch_event_counts",
    "profile_orders_columns",
    "fk_discovery_tpch",
    "hll_overlap_events",
    "theta_overlap_orders",
]

# late-r4 sweep: every remaining registered query gets a timing row so
# the bench record has no silent coverage gap. streaming_sink_distinct
# stays excluded (its wall time is micro-batch machinery startup, not
# data-volume work — same rationale as r3).
EXTRA_QUERIES_R4B = [
    "semdedup_keep_embeddings",
    "lang_id_parity",
    "fingerprint_parity",
    "pack_sequences_documents",
    "consistent_sample_parity",
    "temperature_resample_docs",
    "setop_partkeys_except",
    "customers_without_orders",
    "media_features_documents",
    "hll_users_salted",
    "checkpoint_resume_estimate",
    "minhash_dedup_keep_documents",
    "lang_id_documents",
    "fingerprint_documents",
    "hll_union_en_de",
    "hll_intersect_partkeys",
    "cms_heavy_hitters",
    "hll_distinct_order_part_pairs",
    "theta_except_partkeys",
    "duplicate_groups_documents",
    "text_quality_documents",
    "chunk_documents",
    "bm25_retrieval_documents",
    "salted_join_brand_volume",
    "image_dup_pairs_parity",
    "audio_dup_pairs_parity",
    "warc_ingest_parity",
    "host_pagerank_parity",
    "robots_filter_parity",
    "pseudonymize_docs",
    "k_anonymity_orders",
    "split_sentences_docs",
    "page_meta_parity",
    "warc_corpus_parity",
    "fix_mojibake_parity",
    "anchor_texts_parity",
    "corpus_diff_orders",
    "sliding_distinct_users",
    "kmeans_clusters_embeddings",
    "sliding_distinct_by_type",
    "minhash_join_parity",
    "dedup_increment_parity",
]

# round-5 additions: the end-to-end curation-chain parity query
EXTRA_QUERIES_R5 = [
    "curate_corpus_parity",
]


# the original 16-query suite whose total is the headline "value";
# kept fixed so the number stays comparable across rounds
BASE_QUERIES = [
    "hll_users_by_event_type",
    "hll_custkey_by_month",
    "hll_flagship_distinct_text",
    "cms_event_type_counts",
    "bloom_fk_prefilter",
    "kll_quantiles_price",
    "tdigest_quantiles_value",
    "exact_dedup_documents",
    "minhash_pairs_documents",
    "simhash_pairs_documents",
    "ann_top3",
    "ivf_ann_top3",
    "token_counts_documents",
    "pricing_summary",
    "join_mktsegment_orders",
    "window_top_order_per_cust",
]


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod

    bench_queries = BASE_QUERIES
    qs = entry_mod.queries()
    timings: dict[str, float] = {}
    for name in (
        bench_queries
        + EXTRA_QUERIES
        + EXTRA_QUERIES_R3
        + EXTRA_QUERIES_R4
        + EXTRA_QUERIES_R4B
        + EXTRA_QUERIES_R5
    ):
        qs[name](spark, sf_dir).collect()  # warm: parquet footers, JIT, plan
        # best of 3 warm runs: robust to background-load spikes on this
        # shared VM (per-run variance is up to ~40%)
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        timings[name] = round(min(runs), 3)
    return timings


EXTRACT_SCALING_ROWS = 4_000_000  # extraction is ~40x costlier per row
# than the url flagship (wide html scan + kernel). Raised 1M -> 4M after
# the fixed-overhead probe (scripts/probe_job_overhead.py, recorded in
# BENCH/job_overhead.json): each extract_docs_per_sec call pays a
# ~1.9-2.2 s constant (job submit + stage scheduling + serial 1-task
# merge + estimate collect) that does not shrink with rows. At 1M rows
# the 8-thread pass lasted ~7 s, so that constant alone deflated the
# wall ratio by ~10-15 points (cpu_parity, overhead-insensitive, read
# 0.93-0.94 in the same healthy runs). 4M rows puts the 8-thread pass
# at ~28 s (constant ~6% -> ~2% of wall) — the regime the 100 TB rule
# actually targets, where cluster jobs run minutes and fixed scheduling
# cost is noise. Identical table at BOTH levels keeps the ratio fair;
# runs before/after the change are distinguished by "extract_rows" in
# each run JSON.


def _box_health(seconds: float = 1.0) -> dict:
    """Independent box-health gauge, measured INSIDE each scaling leg:
    (a) single-process DRAM streaming bandwidth (numpy right_shift over
    a 256 MB buffer — the same instrument as BENCH/BASELINE.md §2's
    ~1.7 GB/s ceiling measurement), and (b) the hypervisor steal
    fraction over the gauge window (/proc/stat col 8), and (c) the
    first-touch page-fault latency on a FRESH 64 MB mapping — streaming
    over an already-faulted buffer is blind to the hypervisor fault
    pathology that collapsed the r4g/r4h 8-thread legs while (a)+(b)
    read healthy (~520 us/page measured vs ~1 us healthy). Carried
    per-leg in the run JSON so a contended measurement window is
    recorded as data alongside the throughput it distorted, instead of
    being narrated after the fact."""
    import mmap as _mmap

    import numpy as np

    # (c) first: a fresh private anonymous mapping, touched once per
    # 4 KB page — mmap/munmap directly so the measurement is immune to
    # the heap-reuse allocator policy the engine itself runs under
    fault_bytes = 64 * 1024 * 1024
    mm = _mmap.mmap(-1, fault_bytes)
    t0 = time.perf_counter()
    for pos in range(0, fault_bytes, 4096):
        mm[pos] = 1
    fault_dt = time.perf_counter() - t0
    mm.close()
    fault_us = fault_dt / (fault_bytes // 4096) * 1e6

    def _stat():
        with open("/proc/stat") as f:
            vals = [int(x) for x in f.readline().split()[1:]]
        return sum(vals), (vals[7] if len(vals) > 7 else 0)

    buf = np.empty(32 * 1024 * 1024, dtype=np.uint64)  # 256 MB
    buf[:] = 0x9E3779B97F4A7C15
    np.right_shift(buf, 1, out=buf)  # warm: fault the pages in
    total0, steal0 = _stat()
    t0 = time.perf_counter()
    iters = 0
    while time.perf_counter() - t0 < seconds:
        np.right_shift(buf, 1, out=buf)
        iters += 1
    dt = time.perf_counter() - t0
    total1, steal1 = _stat()
    return {
        # read + write traffic per pass
        "dram_gbps": round(iters * buf.nbytes * 2 / dt / 1e9, 2),
        "steal_frac": round((steal1 - steal0) / max(total1 - total0, 1), 3),
        "fault_us_per_page": round(fault_us, 2),
    }


def scaling_child(cpus: int, shuffle: int) -> None:
    # 16 MB scan splits: the 1M-row extract table is ~1 GB, so the
    # default 64 MB splits give only ~16 scan tasks — 2 waves of 8 with
    # a straggler half-wave idling 7 threads (r4i measured wall eff
    # 0.653 vs cpu_parity 0.927, the signature of scheduling-granularity
    # waste, with every box-health gauge clean). ~64 splits pack both
    # levels evenly; identical config at both levels keeps the ratio fair.
    spark = make_spark(
        cpus, shuffle, ui=True, arrow_batch=16384, file_part_bytes="16m"
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_pages(spark)
    epath = ensure_pages(
        spark, EXTRACT_SCALING_ROWS,
        os.path.join(REPO, "_bench_cache", f"pages_{EXTRACT_SCALING_ROWS}"),
    )
    out = {"cpus": cpus, "health": _box_health(),
           "extract_rows": EXTRACT_SCALING_ROWS}
    for mode in ("xxhash64", "murmur3"):
        # one warm-up pass (JIT/arrow init), then the measured passes
        flagship_docs_per_sec(spark, path, mode)
        before = _io_snapshot(spark)
        cpu0 = _tree_cpu_seconds()
        runs = [flagship_docs_per_sec(spark, path, mode) for _ in range(2)]
        cpu1 = _tree_cpu_seconds()
        after = _io_snapshot(spark)
        out[mode] = [r[0] for r in runs]
        out[f"{mode}_io"] = {
            k: (after[k] - before[k]) // len(runs) for k in after
        }
        # docs per CPU-second (whole process tree incl. Python workers):
        # steal-immune — flat across levels == the engine adds no
        # per-doc work as parallelism grows
        out[f"{mode}_per_cpu"] = runs[0][1] * len(runs) / max(cpu1 - cpu0, 1e-9)
        out["rows"] = runs[0][1]
    # north-star front half: fused extract+hash+sketch over raw html
    extract_docs_per_sec(spark, epath)
    cpu0 = _tree_cpu_seconds()
    # 3 measured passes: extraction is the pre-registered criterion
    # mode, so it gets the largest sample per child
    eruns = [extract_docs_per_sec(spark, epath) for _ in range(3)]
    cpu1 = _tree_cpu_seconds()
    out["extract"] = [r[0] for r in eruns]
    out["extract_per_cpu"] = eruns[0][1] * len(eruns) / max(cpu1 - cpu0, 1e-9)
    # second gauge AFTER the measured region: r4g degraded mid-leg
    # (healthy start gauges, extract eff 0.242) — bracketing the leg
    # lets the healthy classifier catch a collapse that starts late
    out["health_end"] = _box_health()
    print(json.dumps(out))
    spark.stop()


SCALING_LEVELS = (2, 8)  # N and 4N cores — see BENCH/BASELINE.md for why
# not 8/32: this sandbox shows ~45% hypervisor steal time above ~8 busy
# cores, so higher levels measure the hypervisor, not the engine.


def run_scaling(rounds: int = 2) -> dict:
    """Interleave local[N]/local[4N] measurement rounds (fresh JVM each)
    so slow machine-load drift hits both levels equally; report the
    median of all samples per level."""
    lo, hi = SCALING_LEVELS
    samples: dict[int, list[float]] = {lo: [], hi: []}
    rows = 0
    extract_rows = None
    for _ in range(rounds):
        for cpus in (lo, hi):
            out = subprocess.run(
                [sys.executable, __file__, "--scaling-child", str(cpus)],
                capture_output=True,
                text=True,
                cwd=REPO,
                # 4M-row extraction legs run ~10 min healthy at local[2];
                # a degraded-fault window can double that — let it record
                # data rather than kill the whole interleaved run
                timeout=3600,
            )
            jlines = [
                l for l in out.stdout.strip().splitlines() if l.startswith("{")
            ]
            if out.returncode != 0 or not jlines:
                tail = "\n".join(out.stderr.strip().splitlines()[-15:])
                raise RuntimeError(
                    f"scaling child local[{cpus}] rc={out.returncode}, "
                    f"no JSON line; stderr tail:\n{tail}"
                )
            rec = json.loads(jlines[-1])
            samples[cpus].append(rec)
            rows = rec["rows"]
            extract_rows = rec.get("extract_rows")

    def median(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    result = {"rows": rows, "extract_rows": extract_rows}
    for level in (lo, hi):
        hs = [
            h
            for rec in samples[level]
            for h in (rec.get("health"), rec.get("health_end"))
            if h
        ]
        if hs:
            result[f"health_{level}"] = hs
    for mode in ("xxhash64", "murmur3", "extract"):
        mode_lo = [x for rec in samples[lo] for x in rec.get(mode, [])]
        mode_hi = [x for rec in samples[hi] for x in rec.get(mode, [])]
        if not mode_lo or not mode_hi:
            continue
        thr_lo, thr_hi = median(mode_lo), median(mode_hi)
        result[mode] = {
            f"thr_{lo}": round(thr_lo),
            f"thr_{hi}": round(thr_hi),
            "scaling_efficiency": round((thr_hi / thr_lo) / (hi / lo), 3),
            f"samples_{lo}": [round(x) for x in mode_lo],
            f"samples_{hi}": [round(x) for x in mode_hi],
            # measured per-run I/O at each level (UI REST stage metrics):
            # identical scan bytes + ~zero shuffle at both levels is the
            # evidence that the flagship is scan/memory-bound, not
            # shuffle-bound (BENCH/BASELINE.md §2)
            f"io_{lo}": samples[lo][-1].get(f"{mode}_io"),
            f"io_{hi}": samples[hi][-1].get(f"{mode}_io"),
        }
        cpu_lo = [r[f"{mode}_per_cpu"] for r in samples[lo] if f"{mode}_per_cpu" in r]
        cpu_hi = [r[f"{mode}_per_cpu"] for r in samples[hi] if f"{mode}_per_cpu" in r]
        if cpu_lo and cpu_hi:
            # docs per CPU-second at each level (process-tree CPU incl.
            # Python workers, /proc-based): parity ~1.0 means the engine
            # does no extra per-doc work at higher parallelism — the
            # steal-immune complement to the wall-clock efficiency
            result[mode][f"per_cpu_{lo}"] = round(median(cpu_lo))
            result[mode][f"per_cpu_{hi}"] = round(median(cpu_hi))
            result[mode]["cpu_parity"] = round(median(cpu_hi) / median(cpu_lo), 3)
    # run-level headline = the criterion mode (extraction flagship —
    # the end-to-end pipeline; BENCH/BASELINE.md §2), never the best
    # mode of the run (ADVICE r3); cross-run aggregation is the median
    # in summarize_scaling_runs()
    crit = "extract" if "extract" in result else "murmur3"
    result["scaling_efficiency"] = result[crit]["scaling_efficiency"]
    result["metric"] = f"{crit} flagship wall eff (this run)"
    return result


def summarize_scaling_runs(bench_dir: str | None = None) -> dict | None:
    """Fold every committed two-cluster-size run (BENCH/scaling_r*.json)
    into the pre-registered headline (BENCH/BASELINE.md §2): the
    criterion metric is the MEDIAN wall-clock scaling efficiency of the
    EXTRACTION flagship (the end-to-end north-star pipeline; the thin
    hash-only modes saturate this box's shared DRAM bus at 2 threads
    since the r4 kernel and carry a bandwidth account instead) across
    ALL committed interleaved runs (ADVICE r3: median, never the best
    draw), with the median cpu_parity as the steal-immune companion.
    The full per-run table is written to BENCH/scaling_summary.json so
    this record stays tail-capture-sized.
    """
    import glob as _glob

    if bench_dir is None:
        bench_dir = os.path.join(REPO, "BENCH")
    ref_files = sorted(_glob.glob(os.path.join(bench_dir, "scaling_r*.json")))
    if not ref_files:
        return None

    import statistics

    def _med(xs):
        return round(statistics.median(xs), 3) if xs else None

    runs: dict[str, dict] = {}
    per_mode: dict[str, dict[str, list]] = {}
    for rf in ref_files:
        try:
            with open(rf) as fh:
                rec = json.load(fh)
        except (OSError, ValueError):
            continue
        # gauge-healthy = every measured leg saw >=8 GB/s single-process
        # DRAM streaming, <=10% steal, and (where the gauge exists,
        # r4i on) <=40 us/page first-touch fault latency on a fresh
        # mapping — the instrument the r4g/r4h collapses showed the
        # DRAM gauge is blind to (free-page-reporting host: ~1-10 us
        # healthy, ~400+ us degraded). Feeds ONLY the disclosed
        # secondary medians below — never the criterion number.
        healths = [h for hk in ("health_2", "health_8") for h in rec.get(hk, [])]
        healthy = (
            all(
                h.get("dram_gbps", 0) >= 8
                and h.get("steal_frac", 1) <= 0.10
                and h.get("fault_us_per_page", 0) <= 40
                for h in healths
            )
            if healths and any("fault_us_per_page" in h for h in healths)
            else None
        )
        summary = {}
        if rec.get("extract_rows") is not None:
            summary["extract_rows"] = rec["extract_rows"]
        for mode in ("murmur3", "xxhash64", "extract"):
            if mode not in rec:
                continue
            summary[mode] = {
                k: rec[mode].get(k)
                for k in (
                    "thr_2", "thr_8", "scaling_efficiency",
                    "cpu_parity", "io_2", "io_8",
                )
                if rec[mode].get(k) is not None
            }
            acc = per_mode.setdefault(
                mode, {"eff": [], "parity": [], "eff_h": [], "parity_h": [],
                       "eff_cur": [], "parity_cur": []}
            )
            # current-job era: the criterion job was lengthened 1M -> 4M
            # rows once the fixed-overhead probe showed the short job
            # measured the scheduler (BENCH/job_overhead.json). Runs of
            # the two jobs are different measurements and cannot share a
            # median; extract_rows in each run JSON marks the era.
            is_current_job = (
                mode != "extract"
                or rec.get("extract_rows") == EXTRACT_SCALING_ROWS
            )
            if rec[mode].get("scaling_efficiency") is not None:
                acc["eff"].append(rec[mode]["scaling_efficiency"])
                if healthy:
                    acc["eff_h"].append(rec[mode]["scaling_efficiency"])
                if is_current_job:
                    acc["eff_cur"].append(rec[mode]["scaling_efficiency"])
            if rec[mode].get("cpu_parity") is not None:
                acc["parity"].append(rec[mode]["cpu_parity"])
                if healthy:
                    acc["parity_h"].append(rec[mode]["cpu_parity"])
                if is_current_job and rec[mode].get("scaling_efficiency") is not None:
                    acc["parity_cur"].append(rec[mode]["cpu_parity"])
        for hk in ("health_2", "health_8"):
            if rec.get(hk):
                # per-leg box-health gauges (dram_gbps / steal_frac),
                # present from r4e on — lets a reader weight contended
                # windows when reading the per-run spread
                summary[hk] = rec[hk]
        runs[os.path.basename(rf)] = summary
    medians = {
        mode: {
            "eff_median": _med(acc["eff"]),
            "cpu_parity_median": _med(acc["parity"]),
            "n_runs": len(acc["eff"]),
            # secondary diagnostic only (criterion stays the all-runs
            # median above): same medians over runs whose in-leg health
            # gauges were clean — available from r4e on
            "eff_median_gauge_healthy": _med(acc["eff_h"]),
            "cpu_parity_median_gauge_healthy": _med(acc["parity_h"]),
            "n_gauge_healthy": len(acc["eff_h"]),
            # same medians over runs of the CURRENT criterion job only
            # (extract_rows == EXTRACT_SCALING_ROWS; always true for
            # the hash modes, whose job never changed)
            "eff_median_current_job": _med(acc["eff_cur"]),
            "cpu_parity_median_current_job": _med(acc["parity_cur"]),
            "n_current_job": len(acc["eff_cur"]),
        }
        for mode, acc in per_mode.items()
    }
    detail_file = os.path.join(bench_dir, "scaling_summary.json")
    try:
        with open(detail_file, "w") as fh:
            json.dump({"medians": medians, "runs": runs}, fh, indent=1)
    except OSError:
        pass
    ex = medians.get("extract", {})
    mm = medians.get("murmur3", {})
    # THE criterion number (pre-registered in BENCH/BASELINE.md §2):
    # median extraction-flagship wall efficiency across committed runs
    # of the CURRENT criterion job, once >=3 such runs exist (a median
    # needs a sample; the threshold was fixed before any 4M-era
    # efficiency had been measured). Until then the all-era median
    # stands. The all-era and gauge-healthy medians are always carried
    # alongside — nothing is dropped from the table.
    n_cur = ex.get("n_current_job") or 0
    if n_cur >= 3:
        headline = ex.get("eff_median_current_job")
        parity = ex.get("cpu_parity_median_current_job")
        metric = (
            "median extraction-flagship wall eff across committed runs "
            f"of the current criterion job (extract_rows={EXTRACT_SCALING_ROWS}, "
            f"n={n_cur}); all-era median carried in all_era_eff"
        )
    else:
        headline = ex.get("eff_median")
        parity = ex.get("cpu_parity_median")
        metric = "median extraction-flagship wall eff across committed runs"
    return {
        "scaling_efficiency": headline,
        "metric": metric,
        "cpu_parity": parity,
        "all_era_eff": ex.get("eff_median"),
        "all_era_cpu_parity": ex.get("cpu_parity_median"),
        "murmur3_eff": mm.get("eff_median"),
        "murmur3_cpu_parity": mm.get("cpu_parity_median"),
        "n_runs": ex.get("n_runs"),
        "detail": "BENCH/scaling_summary.json",
    }


def main() -> None:
    if "--scaling-child" in sys.argv:
        scaling_child(int(sys.argv[-1]), int(sys.argv[-1]))
        return
    if "--scaling" in sys.argv:
        rounds = 2
        if "--rounds" in sys.argv:
            i = sys.argv.index("--rounds")
            try:
                rounds = int(sys.argv[i + 1])
            except (IndexError, ValueError):
                sys.exit("usage: bench.py --scaling [--rounds N]")
        print(json.dumps(run_scaling(rounds)))
        return

    spark = make_spark(CPUS, ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    health_start = _box_health()
    pages_path = ensure_pages(spark)
    # warm-up: python worker pool + arrow codepaths + page cache
    flagship_docs_per_sec(spark, pages_path)
    io_before = _io_snapshot(spark)
    runs = [flagship_docs_per_sec(spark, pages_path) for _ in range(3)]
    io_after = _io_snapshot(spark)
    flagship_io = {k: (io_after[k] - io_before[k]) // 3 for k in io_after}
    docs_per_sec, n_rows, est = sorted(runs)[1]  # median of 3
    # extraction flagship: 1 warm + 3 measured fused-kernel runs,
    # MEDIAN-of-3 (same policy as the url flagship — ADVICE r3), plus
    # one JVM-chain run for the engine comparison (each run is cold —
    # fresh lineage per call, no shuffle-stage reuse). Measured on its
    # own 4M-row pages table: extraction is ~40x costlier per row than
    # the url flagship, and the reported number is a THROUGHPUT
    # (docs/s, table-size independent) — at 16M rows a degraded-fault
    # window (BASELINE.md §2) could stall the suite past the driver's
    # window without changing the number it reports
    ext_rows = min(PAGES_ROWS, 4_000_000)
    ext_path = ensure_pages(
        spark, ext_rows, os.path.join(REPO, "_bench_cache", f"pages_{ext_rows}")
    )
    extract_docs_per_sec(spark, ext_path)
    ext_runs = [extract_docs_per_sec(spark, ext_path) for _ in range(3)]
    ext_docs_per_sec, _, ext_est = sorted(ext_runs)[1]
    ext_jvm_docs_per_sec, _, _ = extract_docs_per_sec(
        spark, ext_path, engine="jvm"
    )
    scaling_headline = summarize_scaling_runs()
    all_timings = run_queries(spark, SF_DIR)
    later = (
        set(EXTRA_QUERIES)
        | set(EXTRA_QUERIES_R3)
        | set(EXTRA_QUERIES_R4)
        | set(EXTRA_QUERIES_R4B)
        | set(EXTRA_QUERIES_R5)
    )
    timings = {k: v for k, v in all_timings.items() if k not in later}
    extra = {k: v for k, v in all_timings.items() if k in EXTRA_QUERIES}
    extra_r3 = {k: v for k, v in all_timings.items() if k in EXTRA_QUERIES_R3}
    extra_r4 = {k: v for k, v in all_timings.items() if k in EXTRA_QUERIES_R4}
    extra_r4b = {
        k: v for k, v in all_timings.items() if k in EXTRA_QUERIES_R4B
    }
    extra_r5 = {
        k: v for k, v in all_timings.items() if k in EXTRA_QUERIES_R5
    }
    total = round(sum(timings.values()), 3)
    # The suite record MUST be the last stdout line and stay compact
    # (< ~2 KB): the driver captures only a short stdout tail
    # (VERDICT r3 #2). Everything bulky (per-run scaling samples, io
    # detail) lives in BENCH/scaling_summary.json, referenced by name.
    record = {
        "metric": "suite wall time + flagship HLL throughput",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_extra_r2": extra,
        "queries_extra_r3": extra_r3,
        "queries_extra_r4": extra_r4,
        "queries_extra_r4b": extra_r4b,
        "queries_extra_r5": extra_r5,
        "sf": SF_DIR,
        "docs_per_sec": round(docs_per_sec),
        "flagship_rows": n_rows,
        "flagship_estimate": est,
        "extract_docs_per_sec": round(ext_docs_per_sec),
        "extract_docs_per_sec_jvm_engine": round(ext_jvm_docs_per_sec),
        "extract_distinct_text_estimate": ext_est,
        "flagship_io_per_run": flagship_io,
        "scaling": scaling_headline,
        # box-health gauges bracketing the suite (dram_gbps/steal_frac/
        # fault_us_per_page) — classify the measurement window exactly
        # like the scaling legs do (BENCH/BASELINE.md §2)
        "health": [health_start, _box_health()],
    }
    # The untrimmed record always lands in BENCH/bench_full.json; the
    # stdout line is trimmed (oldest-stable detail first) to fit the
    # driver's ~2 KB tail capture.
    try:
        with open(os.path.join(REPO, "BENCH", "bench_full.json"), "w") as fh:
            json.dump(record, fh, indent=1)
    except OSError:
        pass
    # victims are generic so the contract survives future rounds: the
    # io detail first, then every queries_extra_rN map oldest-first
    # (each folds into a _total), and as a last resort the per-query
    # values are rounded harder. "queries" and "scaling" never drop.
    victims = ["flagship_io_per_run", "health"] + sorted(
        k for k in record if k.startswith("queries_extra_")
    )
    line = json.dumps(record, separators=(",", ":"))
    for victim in victims:
        if len(line) <= 1900:
            break
        dropped = record.pop(victim, None)
        if isinstance(dropped, dict) and victim.startswith("queries"):
            record[victim + "_total"] = round(sum(dropped.values()), 3)
        record["full_record"] = "BENCH/bench_full.json"
        line = json.dumps(record, separators=(",", ":"))
    if len(line) > 1900:
        record["queries"] = {k: round(v, 1) for k, v in record["queries"].items()}
        line = json.dumps(record, separators=(",", ":"))
    spark.stop()
    print(line, flush=True)


if __name__ == "__main__":
    main()
