"""Sliding HyperLogLog (Chabchoub-Hebrail LFPM) kernel + operator tests.

The load-bearing check is the brute-force one: for ANY window start, the
registers recovered from the one-pass LFPM must equal the registers of a
from-scratch HLL build over only the in-window items. Everything else
(estimator accuracy, merge algebra, serialization) follows the same
contracts the base HLL suite pins.
"""

from __future__ import annotations

import numpy as np
import pytest

from hll_spark.sketchlib.hll import HllConfig
from hll_spark.sketchlib.slidinghll import (
    SlidingHll,
    _derive,
    _dominance_prune,
)

CFG = HllConfig(log2m=10, regwidth=5)


def _stream(n: int, seed: int, t_hi: int = 1_000_000):
    rng = np.random.default_rng(seed)
    h = rng.integers(-(2**63), 2**63, size=n, dtype=np.int64)
    t = rng.integers(0, t_hi, size=n, dtype=np.int64)
    return h, t


def _brute_registers(h: np.ndarray, t: np.ndarray, start, cfg) -> np.ndarray:
    mask = np.ones(len(h), bool) if start is None else t >= start
    j, pw, _ = _derive(h[mask].view(np.uint64), cfg)
    regs = np.zeros(cfg.m, np.uint8)
    np.maximum.at(regs, j, pw)
    return regs


class TestLfpmWindows:
    def test_window_registers_match_brute_force(self):
        h, t = _stream(20_000, seed=7)
        s = SlidingHll(CFG)
        for i in range(0, len(h), 3_000):  # chunked adds exercise pruning
            s.add_hashed(h[i : i + 3_000], t[i : i + 3_000])
        for start in [None, 0, 1, 250_000, 500_000, 900_000, 999_999, 10**7]:
            assert np.array_equal(
                s.registers_at(start), _brute_registers(h, t, start, CFG)
            ), start

    def test_duplicate_timestamps_and_values(self):
        # heavy collisions on both axes: few distinct hashes, few ts
        rng = np.random.default_rng(3)
        h = rng.integers(0, 50, size=5_000, dtype=np.int64) * 7919
        t = rng.integers(0, 10, size=5_000, dtype=np.int64)
        s = SlidingHll(CFG).add_hashed(h, t)
        for start in [None, 0, 5, 9, 10]:
            assert np.array_equal(
                s.registers_at(start), _brute_registers(h, t, start, CFG)
            )

    def test_lfpm_size_stays_logarithmic(self):
        # expected LFPM length per register is O(ln n): at n=200k and
        # m=1024 the pruned store must be far below n (paper's memory
        # claim, the reason the sketch is shippable at all)
        h, t = _stream(200_000, seed=11)
        s = SlidingHll(CFG).add_hashed(h, t)
        s._prune()
        assert len(s.reg) < 12 * CFG.m  # ~ m * ln(n/m) with slack

    def test_estimate_error_within_bound(self):
        cfg = HllConfig(log2m=12, regwidth=5)
        h, t = _stream(200_000, seed=5)
        t = np.arange(len(h), dtype=np.int64)
        s = SlidingHll(cfg).add_hashed(h, t)
        sigma = 1.04 / np.sqrt(cfg.m)
        for start in [0, 100_000, 150_000, 190_000]:
            exact = len(set(h[t >= start].tolist()))
            est = s.estimate(start)
            assert abs(est - exact) / exact < 3 * sigma

    def test_empty_and_out_of_range_windows(self):
        s = SlidingHll(CFG)
        assert s.estimate(None) == 0
        h, t = _stream(1_000, seed=1)
        s.add_hashed(h, t)
        assert s.estimate(10**9) == 0  # window after every event


class TestMergeAlgebra:
    def _build(self, h, t):
        return SlidingHll(CFG).add_hashed(h, t)

    def test_merge_is_canonical_any_order(self):
        h, t = _stream(21_000, seed=13)
        parts = [(h[i::3], t[i::3]) for i in range(3)]
        one = self._build(h, t)
        abc = self._build(*parts[0]).merge(self._build(*parts[1])).merge(
            self._build(*parts[2])
        )
        cba = self._build(*parts[2]).merge(self._build(*parts[1])).merge(
            self._build(*parts[0])
        )
        assert abc.to_bytes() == cba.to_bytes() == one.to_bytes()

    def test_merge_idempotent(self):
        h, t = _stream(5_000, seed=17)
        a = self._build(h, t)
        b = self._build(h, t)
        assert a.merge(b).to_bytes() == self._build(h, t).to_bytes()

    def test_merge_rejects_mismatched_params(self):
        with pytest.raises(ValueError):
            SlidingHll(HllConfig(log2m=10)).merge(SlidingHll(HllConfig(log2m=12)))

    def test_mixed_mode_merge(self):
        h, t = _stream(8_000, seed=19)
        expl = SlidingHll(CFG, explicit_threshold=100_000).add_hashed(
            h[:4_000], t[:4_000]
        )
        lfpm = SlidingHll(CFG).add_hashed(h[4_000:], t[4_000:])
        merged = lfpm.merge(expl)
        full = SlidingHll(CFG).add_hashed(h, t)
        assert merged.to_bytes() == full.to_bytes()


class TestExplicitTier:
    def test_exact_window_counts(self):
        rng = np.random.default_rng(23)
        h = rng.integers(0, 3_000, size=30_000, dtype=np.int64)
        t = rng.integers(0, 10**6, size=30_000, dtype=np.int64)
        s = SlidingHll(CFG, explicit_threshold=10_000).add_hashed(h, t)
        for start in [None, 0, 400_000, 999_999]:
            vals = h if start is None else h[t >= start]
            assert s.estimate(start) == len(set(vals.tolist()))

    def test_promotion_preserves_registers(self):
        h, t = _stream(6_000, seed=29)
        e = SlidingHll(CFG, explicit_threshold=2_000)
        e.add_hashed(h, t)  # crosses the threshold -> promotes
        assert e.mode == 1
        full = SlidingHll(CFG).add_hashed(h, t)
        # promotion keeps only the LATEST timestamp per hash; an earlier
        # duplicate of a hash can never dominate (same rank, earlier t),
        # so the pruned LFPMs agree exactly (headers differ only in the
        # recorded explicit_threshold)
        e._prune()
        full._prune()
        for a, b in ((e.reg, full.reg), (e.ts, full.ts), (e.rank, full.rank)):
            assert np.array_equal(a, b)
        assert e.max_ts == full.max_ts


class TestSerialization:
    def test_roundtrip_both_modes(self):
        h, t = _stream(9_000, seed=31)
        for thresh in (0, 100_000):
            s = SlidingHll(CFG, explicit_threshold=thresh).add_hashed(h, t)
            blob = s.to_bytes()
            back = SlidingHll.from_bytes(blob)
            assert back.to_bytes() == blob
            assert back.estimate(500_000) == s.estimate(500_000)
            assert back.max_ts == s.max_ts

    def test_rejects_garbage(self):
        with pytest.raises(ValueError):
            SlidingHll.from_bytes(b"XXXX" + b"\x00" * 32)


class TestDominancePrune:
    def test_prune_matches_quadratic_reference(self):
        rng = np.random.default_rng(37)
        n = 400
        reg = rng.integers(0, 8, size=n, dtype=np.int64)
        ts = rng.integers(0, 20, size=n, dtype=np.int64)
        rank = rng.integers(1, 30, size=n).astype(np.uint8)
        pr, pt, pk = _dominance_prune(reg, ts, rank)
        got = set(zip(pr.tolist(), pt.tolist(), pk.tolist()))
        # quadratic reference: survive iff no OTHER entry has same reg,
        # ts' >= ts and rank' >= rank (exact duplicates keep one copy)
        entries = list(zip(reg.tolist(), ts.tolist(), rank.tolist()))
        expect = set()
        for e in set(entries):
            dominated = any(
                o != e and o[0] == e[0] and o[1] >= e[1] and o[2] >= e[2]
                for o in set(entries)
            )
            if not dominated:
                expect.add(e)
        assert got == expect

    def test_prune_idempotent(self):
        h, t = _stream(5_000, seed=41)
        s = SlidingHll(CFG).add_hashed(h, t)
        s._prune()
        snap = (s.reg.copy(), s.ts.copy(), s.rank.copy())
        s._prune()
        assert all(np.array_equal(a, b) for a, b in zip(snap, (s.reg, s.ts, s.rank)))


class TestSlidingOperator:
    def test_windows_match_duckdb_exact(self, spark, sf_dir):
        import duckdb

        duck = duckdb.connect()
        from hll_spark.operators.sliding import sliding_distinct_windows

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        out = sliding_distinct_windows(
            ev,
            "user_id",
            "ts",
            windows={"w1_1d": 86400, "w2_7d": 7 * 86400, "w3_30d": 30 * 86400},
            cfg=HllConfig(log2m=14, regwidth=5),
            explicit_threshold=1 << 18,
        ).collect()
        got = {r["window"]: r["distinct"] for r in out}
        ref = dict(
            duck.execute(
                f"""
                WITH mx AS (SELECT max(ts) AS mt
                            FROM '{sf_dir}/events.parquet'),
                w(win, span_s) AS (VALUES ('w1_1d', 86400),
                                          ('w2_7d', 604800),
                                          ('w3_30d', 2592000))
                SELECT w.win, COUNT(DISTINCT e.user_id)
                FROM '{sf_dir}/events.parquet' e, mx, w
                WHERE e.user_id IS NOT NULL
                  AND e.ts >= mx.mt - to_microseconds(
                        CAST(span_s AS BIGINT) * 1000000)
                GROUP BY w.win
                """
            ).fetchall()
        )
        assert got == ref

    def test_lfpm_tier_distributed_bound(self, spark, sf_dir):
        # the scale path: LFPM registers, partial sketches merged across
        # partitions — estimate must track exact within 3 sigma
        from hll_spark.operators.sliding import sliding_distinct_windows

        cfg = HllConfig(log2m=12, regwidth=5)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(8)
        out = sliding_distinct_windows(
            ev, "user_id", "ts", windows={"all": 10**9}, cfg=cfg
        ).collect()
        exact = ev.selectExpr("count(distinct user_id) c").collect()[0]["c"]
        sigma = 1.04 / np.sqrt(cfg.m)
        assert abs(out[0]["distinct"] - exact) <= max(3 * sigma * exact, 3)

    def test_grouped_windows_match_duckdb_exact(self, spark, sf_dir):
        import duckdb

        from hll_spark.operators.sliding import sliding_distinct_windows

        ev = spark.read.parquet(f"{sf_dir}/events.parquet").repartition(7)
        out = sliding_distinct_windows(
            ev,
            "user_id",
            "ts",
            windows={"w1_1d": 86400, "w2_30d": 30 * 86400},
            cfg=HllConfig(log2m=14, regwidth=5),
            explicit_threshold=1 << 18,
            by=["event_type"],
        ).collect()
        got = {(r["event_type"], r["window"]): r["distinct"] for r in out}
        ref = dict(
            (
                ((et, win), c)
                for et, win, c in duckdb.connect()
                .execute(
                    f"""
                WITH mx AS (SELECT max(ts) AS mt
                            FROM '{sf_dir}/events.parquet'
                            WHERE user_id IS NOT NULL AND ts IS NOT NULL),
                w(win, span_s) AS (VALUES ('w1_1d', 86400),
                                          ('w2_30d', 2592000))
                SELECT e.event_type, w.win, COUNT(DISTINCT e.user_id)
                FROM '{sf_dir}/events.parquet' e, mx, w
                WHERE e.user_id IS NOT NULL
                  AND e.ts >= mx.mt - to_microseconds(
                        CAST(span_s AS BIGINT) * 1000000)
                GROUP BY e.event_type, w.win
                """
                )
                .fetchall()
            )
        )
        assert got == ref

    def test_grouped_partition_invariance(self, spark, sf_dir):
        from hll_spark.operators.sliding import sliding_distinct_windows

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        kw = dict(
            windows={"w": 7 * 86400},
            cfg=HllConfig(log2m=11, regwidth=5),
            by=["event_type"],
        )
        a = sliding_distinct_windows(ev.repartition(1), "user_id", "ts", **kw)
        b = sliding_distinct_windows(ev.repartition(13), "user_id", "ts", **kw)
        rows_a = sorted(tuple(r) for r in a.collect())
        rows_b = sorted(tuple(r) for r in b.collect())
        # canonical merge: LFPM estimates identical at ANY partitioning
        assert rows_a == rows_b and rows_a
