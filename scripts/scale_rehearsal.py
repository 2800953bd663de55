"""Larger-n scale rehearsal (VERDICT r4 next-round #5).

Validates the O(n) claims and the driver-side bounded-state claims at
4x the largest round-4 bench table by running three legs at two sizes
each and comparing wall-clock growth against input growth:

- flagship  : distinct-url HLL sketch build (scan -> mapInPandas
              partials -> tree merge) at 16M and 64M rows.
- pack      : pack_sequences two-phase prefix-sum manifest at 16M and
              64M rows (token counts derived in codegen from the url
              hash — isolates the operator; driver state = one row per
              partition, recorded to prove boundedness).
- dedup     : minhash_index build + dedup_increment_index (rep verify)
              at (index 1M, new 250k) and (index 4M, new 1M) docs cut
              hash-deterministically from the pages tables.

A leg passes when wall(big)/wall(small) <= (n_big/n_small) * SLACK —
sub-linear or linear growth; super-linear growth beyond the slack
fails loudly. SLACK covers fixed per-job overhead and this box's
documented 2-3x session variance (BENCH/BASELINE.md §2) — the point
is catching an O(n^2) step (4x data -> 16x wall), not timing noise.

Writes BENCH/scale_rehearsal.json and prints one JSON line.

Run: python scripts/scale_rehearsal.py [--small 16000000 --big 64000000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

SLACK = 2.0


def flagship_leg(spark, n_rows: int) -> dict:
    path = bench.ensure_pages(
        spark, n_rows, os.path.join(REPO, "_bench_cache", f"pages_{n_rows}")
    )
    bench.flagship_docs_per_sec(spark, path)  # warm: footers, JIT
    runs = [bench.flagship_docs_per_sec(spark, path) for _ in range(3)]
    dps, rows, est = sorted(runs)[1]
    return {"rows": rows, "docs_per_sec": round(dps), "estimate": est,
            "wall_sec": round(rows / dps, 3)}


def pack_leg(spark, n_rows: int) -> dict:
    from pyspark.sql import functions as F

    from hll_spark.operators.packing import pack_sequences

    path = os.path.join(REPO, "_bench_cache", f"pages_{n_rows}")
    sized = spark.read.parquet(path).select(
        F.xxhash64("url").alias("doc_id"),  # manifest ids are long
        (F.pmod(F.xxhash64("url", F.lit(7)), F.lit(509)) + 1).alias("n_tok"),
    )
    n_parts = sized.rdd.getNumPartitions()
    t0 = time.perf_counter()
    manifest = pack_sequences(sized, "doc_id", "n_tok", 2048)
    row = manifest.agg(
        F.count("*").alias("rows"), F.max("pack_id").alias("max_pack")
    ).collect()[0]
    wall = time.perf_counter() - t0
    return {"rows": n_rows, "manifest_rows": row["rows"],
            "n_sequences": int(row["max_pack"]) + 1,
            "driver_state_rows": n_parts,  # per-partition totals only
            "wall_sec": round(wall, 3)}


def dedup_leg(spark, n_rows: int, idx_buckets: int, new_bucket: int) -> dict:
    """Index = docs whose url-hash bucket (mod 64) < idx_buckets, new =
    the single bucket `new_bucket` (disjoint) — deterministic cuts of
    the same pages table."""
    from pyspark.sql import functions as F

    from hll_spark.operators.dedup import dedup_increment_index, minhash_index

    path = os.path.join(REPO, "_bench_cache", f"pages_{n_rows}")
    pages = spark.read.parquet(path)
    bk = F.pmod(F.xxhash64("url"), F.lit(64))
    base = pages.select(
        F.col("url").alias("doc_id"), "text", bk.alias("__bk")
    )
    corpus = base.where(F.col("__bk") < idx_buckets).drop("__bk")
    new = base.where(F.col("__bk") == new_bucket).drop("__bk")

    t0 = time.perf_counter()
    idx = minhash_index(corpus, "text", "doc_id")
    idx_path = os.path.join(REPO, "_bench_cache", f"_rehearsal_idx_{n_rows}")
    idx.write.mode("overwrite").parquet(idx_path)
    index_wall = time.perf_counter() - t0
    stored = spark.read.parquet(idx_path)
    n_idx = stored.count()

    t0 = time.perf_counter()
    kept = dedup_increment_index(new, stored, "text", "doc_id")
    n_kept = kept.count()
    inc_wall = time.perf_counter() - t0
    n_new = new.count()
    return {"rows": n_rows, "index_docs": n_idx, "new_docs": n_new,
            "kept_docs": n_kept, "index_wall_sec": round(index_wall, 3),
            "increment_wall_sec": round(inc_wall, 3)}


def ratio_check(name: str, small: float, big: float, n_ratio: float) -> dict:
    growth = big / max(small, 1e-9)
    ok = growth <= n_ratio * SLACK
    return {"leg": name, "wall_small": small, "wall_big": big,
            "wall_growth": round(growth, 2), "n_growth": n_ratio,
            "linear_ok": ok}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=16_000_000)
    ap.add_argument("--big", type=int, default=64_000_000)
    args = ap.parse_args()
    n_ratio = args.big / args.small

    spark = bench.make_spark(bench.CPUS)
    try:
        out: dict = {"small_rows": args.small, "big_rows": args.big}
        fs = flagship_leg(spark, args.small)
        fb = flagship_leg(spark, args.big)
        out["flagship"] = {"small": fs, "big": fb}
        ps = pack_leg(spark, args.small)
        pb = pack_leg(spark, args.big)
        out["pack"] = {"small": ps, "big": pb}
        # dedup cuts: small = 4/64 of 16M (~1M) idx + 1/64 (~250k) new;
        # big = 4/64 of 64M (~4M) idx + 1/64 (~1M) new -> 4x both sides
        ds = dedup_leg(spark, args.small, idx_buckets=4, new_bucket=4)
        db = dedup_leg(spark, args.big, idx_buckets=4, new_bucket=4)
        out["dedup_increment"] = {"small": ds, "big": db}
        checks = [
            ratio_check("flagship", fs["wall_sec"], fb["wall_sec"], n_ratio),
            ratio_check("pack", ps["wall_sec"], pb["wall_sec"], n_ratio),
            ratio_check("dedup_index", ds["index_wall_sec"],
                        db["index_wall_sec"],
                        db["index_docs"] / max(ds["index_docs"], 1)),
            ratio_check("dedup_increment", ds["increment_wall_sec"],
                        db["increment_wall_sec"],
                        db["new_docs"] / max(ds["new_docs"], 1)),
        ]
        out["checks"] = checks
        out["all_linear"] = all(c["linear_ok"] for c in checks)
        with open(os.path.join(REPO, "BENCH", "scale_rehearsal.json"), "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps({"scale_rehearsal": out["all_linear"],
                          "checks": checks}))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
