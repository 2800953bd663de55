"""Measure the FIXED per-job overhead of the extraction-flagship action.

Why this exists (round 4): the two-cluster-size criterion divides wall
times of the same job at local[2] vs local[8]. Every call to
``extract_docs_per_sec`` pays a constant cost that does not shrink with
parallelism — job submission, stage scheduling, the serial final-merge
stage (one task), and the 1-row estimate collect. At r4j's measured
rates the 8-thread pass over the 1M-row table lasts ~7 s while the
2-thread pass lasts ~27 s, so a ~1 s constant costs the 8-leg ~14% but
the 2-leg only ~4% — deflating the wall ratio by ~10 points with zero
engine involvement (cpu_parity, which is overhead-insensitive, already
sits near 1.0 in healthy runs).

The probe: run the IDENTICAL pipeline (extract_sketch_agg -> estimate
-> collect) on a tiny table (default 20k rows) where compute is ~0.2 s,
so wall ~= fixed overhead, at both criterion levels. Report the medians.
If overhead is material, the fix is to lengthen the measured job
(raise EXTRACT_SCALING_ROWS) — identical at both levels, so the ratio
stays fair and the job moves toward the regime the 100 TB rule actually
targets (cluster jobs run minutes, not seconds; fixed scheduling cost
is amortized to nothing there).

Usage: python scripts/probe_job_overhead.py [tiny_rows]
Prints one JSON line: {"overhead_2": sec, "overhead_8": sec, ...}.
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from bench import ensure_pages, extract_docs_per_sec, make_spark  # noqa: E402


def probe(cpus: int, tiny_rows: int, passes: int = 5) -> dict:
    spark = make_spark(cpus, cpus, ui=False, arrow_batch=16384,
                       file_part_bytes="16m")
    spark.sparkContext.setLogLevel("ERROR")
    path = ensure_pages(
        spark, tiny_rows,
        os.path.join(REPO, "_bench_cache", f"pages_{tiny_rows}"),
    )
    # warm-up exactly like scaling_child: JIT, Arrow init, worker pool
    extract_docs_per_sec(spark, path)
    walls = []
    for _ in range(passes):
        t0 = time.perf_counter()
        extract_docs_per_sec(spark, path)
        walls.append(time.perf_counter() - t0)
    spark.stop()
    walls.sort()
    return {"walls": [round(w, 3) for w in walls],
            "median": round(walls[len(walls) // 2], 3)}


def main() -> None:
    tiny = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    out = {"tiny_rows": tiny}
    for cpus in (2, 8):
        r = probe(cpus, tiny)
        out[f"overhead_{cpus}"] = r["median"]
        out[f"walls_{cpus}"] = r["walls"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
