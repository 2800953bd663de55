"""Round-6 per-query profiler (guide §1): reproduces bench.py's timing
methodology (same session config via bench.make_spark, warm + best-of-3
collect) and additionally records, per query:

  - wall seconds (best of 3) and df-construction time (Catalyst-side
    plan building happens inside the timed region in bench.py, so it is
    measured separately here)
  - number of Spark jobs / stages / tasks launched by one collect
  - the formatted physical plan, written to plans/r06/<name>_<tag>.txt

Usage:
  python scripts/profile_r06.py [--tag before] [--queries a,b,c | --base | --heavy]

Results land in /tmp/profile_r06_<tag>.json (one JSON line per query on
stdout as they finish, so partial runs still yield data).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (frozen harness — reused, not modified)

# the most expensive non-headline queries by BENCH/bench_full.json
HEAVY = [
    "curate_corpus_parity",
    "curate_corpus_docs",
    "quality_classifier_parity",
    "dup_connected_components",
    "decontaminate_bloom",
    "bpe_merges_documents",
    "decontaminate_ngrams",
    "embedding_dup_pairs",
    "semdedup_parity",
    "extract_text_pages",
    "extract_text_pages_arrow",
    "minhash_dedup_parity",
    "ivf_ann_parity",
    "lsh_ann_parity",
    "host_pagerank_parity",
    "kmeans_clusters_embeddings",
]


def profile_query(spark, qs, name, sf_dir, tag):
    sc = spark.sparkContext
    t0 = time.perf_counter()
    df = qs[name](spark, sf_dir)
    build_s = time.perf_counter() - t0
    # formatted plan (pre-execution; AQE initial plan)
    os.makedirs(os.path.join(REPO, "plans", "r06"), exist_ok=True)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(REPO, "plans", "r06", f"{name}_{tag}.txt"), "w") as fh:
        fh.write(plan)
    # warm
    df.collect()
    # instrumented run: job/stage/task counts for one collect
    st = sc.statusTracker()
    jobs_before = set(st.getJobIdsForGroup() or [])
    df2 = qs[name](spark, sf_dir)
    t0 = time.perf_counter()
    df2.collect()
    one_run = time.perf_counter() - t0
    jobs_after = set(st.getJobIdsForGroup() or [])
    new_jobs = sorted(jobs_after - jobs_before)
    n_stages = 0
    n_tasks = 0
    for jid in new_jobs:
        ji = st.getJobInfo(jid)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si is not None and si.numCompletedTasks > 0:
                n_stages += 1
                n_tasks += si.numTasks
    # best-of-3 (bench methodology)
    runs = [one_run]
    for _ in range(2):
        dfi = qs[name](spark, sf_dir)
        t0 = time.perf_counter()
        dfi.collect()
        runs.append(time.perf_counter() - t0)
    return {
        "query": name,
        "best_s": round(min(runs), 3),
        "runs": [round(r, 3) for r in runs],
        "build_s": round(build_s, 3),
        "n_jobs": len(new_jobs),
        "n_stages": n_stages,
        "n_tasks": n_tasks,
        "plan_exchanges": plan.count("Exchange"),
        "plan_python": sum(
            plan.count(k)
            for k in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "PythonMapInArrow", "FlatMapGroupsInPandas")
        ),
    }


def main():
    tag = "before"
    if "--tag" in sys.argv:
        tag = sys.argv[sys.argv.index("--tag") + 1]
    if "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")
    elif "--heavy" in sys.argv:
        names = HEAVY
    else:
        names = list(bench.BASE_QUERIES)

    spark = bench.make_spark(bench.CPUS, ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    out = []
    for name in names:
        spark.sparkContext.setJobDescription(f"profile:{name}")
        try:
            rec = profile_query(spark, qs, name, bench.SF_DIR, tag)
        except Exception as e:  # keep going; record the failure
            rec = {"query": name, "error": str(e)[:500]}
        print(json.dumps(rec), flush=True)
        out.append(rec)
    with open(f"/tmp/profile_r06_{tag}.json", "w") as fh:
        json.dump(out, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
