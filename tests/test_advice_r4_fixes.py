"""Regression tests for the ADVICE r4 findings.

One test per finding:
- minhash_join_index / streaming wire-up validate stored sig/bk
  lengths against (k, bands) — a mismatched index must raise, not
  silently miss duplicates (medium).
- zero/null vectors are excluded from every cosine-pair variant
  (embedding_dup_pairs, _allpairs, _blocked, embedding_join) instead
  of surviving as NaN-cosine pairs under Spark's NaN ordering (low).
- kmeans_assign returns null cluster/d2 for null vectors instead of
  crashing the pandas UDF (low).
- kmeans_quantized_profile raises on int64-overflow-capable magnitudes
  instead of silently wrapping (low).
- the ungrouped sliding_distinct_users oracle anchors at the same
  null-filtered max(ts) as the sketch (low; asserted via the grouped/
  ungrouped oracle CTEs matching on a null-bearing corpus).
"""

import numpy as np
import pytest

from hll_spark.operators import dedup as D
from hll_spark.operators import clustering as C


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestMinhashIndexValidation:
    def test_mismatched_k_raises(self, spark):
        corpus = _docs(spark, [(1, "the quick brown fox jumps over it")])
        new = _docs(spark, [(2, "the quick brown fox jumps over it")])
        idx = D.minhash_index(corpus, "text", "doc_id", k=64, bands=16)
        with pytest.raises(ValueError, match="sig length 64 != k=128"):
            D.minhash_join_index(new, idx, "text", "doc_id", k=128, bands=32)

    def test_mismatched_bands_raises(self, spark):
        corpus = _docs(spark, [(1, "the quick brown fox jumps over it")])
        new = _docs(spark, [(2, "the quick brown fox jumps over it")])
        idx = D.minhash_index(corpus, "text", "doc_id", k=128, bands=16)
        with pytest.raises(ValueError, match="band count 16 != bands=32"):
            D.minhash_join_index(new, idx, "text", "doc_id", k=128, bands=32)

    def test_matching_params_pass_and_join(self, spark):
        corpus = _docs(spark, [(1, "the quick brown fox jumps over it")])
        new = _docs(spark, [(2, "the quick brown fox jumps over it")])
        idx = D.minhash_index(corpus, "text", "doc_id", k=64, bands=16)
        out = D.minhash_join_index(
            new, idx, "text", "doc_id", k=64, bands=16
        ).collect()
        assert [(r.left_id, r.right_id) for r in out] == [(2, 1)]

    def test_rep_path_validates_too(self, spark):
        corpus = _docs(spark, [(1, "the quick brown fox jumps over it")])
        new = _docs(spark, [(2, "something else entirely here now")])
        idx = D.minhash_index(corpus, "text", "doc_id", k=64, bands=16)
        with pytest.raises(ValueError, match="sig length"):
            D.dedup_increment_index(
                new, idx, "text", "doc_id", k=128, bands=32, verify="rep"
            )

    def test_empty_index_vacuously_passes(self, spark):
        corpus = _docs(spark, []).where("doc_id IS NOT NULL")
        new = _docs(spark, [(2, "anything at all")])
        idx = D.minhash_index(corpus, "text", "doc_id", k=64, bands=16)
        out = D.minhash_join_index(new, idx, "text", "doc_id", k=64, bands=16)
        assert out.count() == 0


class TestZeroNormVectors:
    """A zero vector has undefined cosine; previously 0/0 -> NaN and
    Spark's `NaN >= t` is TRUE, so two zero vectors in the same
    degenerate bucket emitted a bogus NaN pair."""

    def _vecs(self, spark):
        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [1.0, 0.0, 0.0, 0.0]),
            (3, [0.0, 0.0, 0.0, 0.0]),   # zero vector
            (4, [0.0, 0.0, 0.0, 0.0]),   # zero vector
            (5, None),                    # null vector
            # NaN element: squared norm is NaN and NaN > 0 is TRUE
            # under Spark's NaN ordering, so without the explicit
            # isnan rejection these two emit a cosine=NaN pair
            # (ADVICE r5)
            (6, [float("nan"), 1.0, 0.0, 0.0]),
            (7, [float("nan"), 1.0, 0.0, 0.0]),
        ]
        return spark.createDataFrame(rows, "vec_id long, v array<double>")

    def test_dup_pairs_lsh_excludes_zero_vectors(self, spark):
        out = D.embedding_dup_pairs(
            self._vecs(spark), "v", "vec_id", threshold=0.9, dim=4
        ).collect()
        assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}
        assert all(not np.isnan(r.cosine) for r in out)

    def test_allpairs_excludes_zero_vectors(self, spark):
        out = D.embedding_dup_pairs_allpairs(
            self._vecs(spark), "v", "vec_id", threshold=0.9
        ).collect()
        assert {(r.id_a, r.id_b) for r in out} == {(1, 2)}

    def test_blocked_matches_allpairs_with_zero_vectors(self, spark):
        df = self._vecs(spark)
        blocked = D.embedding_dup_pairs_blocked(
            df, "v", "vec_id", threshold=0.9, n_blocks=3
        ).collect()
        assert {(r.id_a, r.id_b) for r in blocked} == {(1, 2)}

    def test_embedding_join_excludes_zero_vectors(self, spark):
        df = self._vecs(spark)
        out = D.embedding_join(
            df, df, "v", "vec_id", threshold=0.9, dim=4
        ).collect()
        pairs = {(r.left_id, r.right_id) for r in out}
        assert pairs == {(1, 1), (1, 2), (2, 1), (2, 2)}
        assert all(not np.isnan(r.cosine) for r in out)


class TestKmeansGuards:
    def test_assign_nulls_get_null_cluster(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [10.0, 10.0]), (3, None)],
            "vec_id long, v array<double>",
        )
        cents = np.array([[0.0, 0.0], [10.0, 10.0]])
        rows = {
            r.vec_id: r
            for r in C.kmeans_assign(df, "v", cents, dist_col="d2").collect()
        }
        assert rows[1].cluster == 0 and rows[1].d2 == 0.0
        assert rows[2].cluster == 1 and rows[2].d2 == 0.0
        assert rows[3].cluster is None and rows[3].d2 is None

    def test_quantized_profile_overflow_raises(self, spark):
        # |q| ~ 3e9 * 2^20 at the default scale -> dim*(2*max)^2 >> 2^63
        big = 3.0e9
        df = spark.createDataFrame(
            [(1, [big, big]), (2, [-big, big]), (3, [0.0, 0.0])],
            "vec_id long, v array<double>",
        )
        with pytest.raises(Exception, match="overflow int64"):
            C.kmeans_quantized_profile(df, "v", "vec_id", k=2).collect()

    def test_quantized_profile_in_bound_still_exact(self, spark):
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, [1.5, 2.0]), (3, [100.0, -50.0])],
            "vec_id long, v array<double>",
        )
        out = {
            r.cluster: r
            for r in C.kmeans_quantized_profile(
                df, "v", "vec_id", k=2
            ).collect()
        }
        # centroids = rows 1 and 2 (each assigns to itself at cost 0);
        # row 3 contributes its argmin distance
        scale = 1 << 20
        q = lambda x: int(np.floor(x * scale + 0.5))
        d2_31 = (q(100.0) - q(1.0)) ** 2 + (q(-50.0) - q(2.0)) ** 2
        d2_32 = (q(100.0) - q(1.5)) ** 2 + (q(-50.0) - q(2.0)) ** 2
        assert sum(r.n_members for r in out.values()) == 3
        assert sum(r.cost_q for r in out.values()) == min(d2_31, d2_32)


def test_sliding_oracle_anchors_match_on_null_bearing_events():
    """Both sliding oracles must anchor max(ts) over rows with
    non-null user_id AND ts (matching the sketch's projection filter).
    Replays the two CTEs on a corpus where the global max ts sits on a
    null-user row — before the fix the ungrouped anchor drifted."""
    import duckdb

    import __spark_entry__ as entry

    con = duckdb.connect()
    con.sql(
        """
        CREATE VIEW events AS
        SELECT * FROM (VALUES
          (1, TIMESTAMP '2024-01-05 00:00:00', 'u1', 'click'),
          (2, TIMESTAMP '2024-01-11 00:00:00', 'u2', 'click'),
          (3, TIMESTAMP '2024-03-01 00:00:00', NULL, 'click'),
          (4, NULL, 'u3', 'view')
        ) AS t(event_id, ts, user_id, event_type)
        """
    )
    sql = entry.oracle_sql()["sliding_distinct_users"]
    got = {r[0]: r[1] for r in con.sql(sql).fetchall()}
    # anchor must be 2024-01-11 (row 3 has a null user, row 4 a null
    # ts): the 1-day window holds u2 only, 7d/30d hold u1+u2. With the
    # pre-fix anchor (2024-03-01, from the null-user row) every window
    # missed u2 and the 1d/7d windows were empty.
    assert got == {"w1_1d": 1, "w2_7d": 2, "w3_30d": 2}


class TestDuplicateIdJoinExplosion:
    """r5 finding (profiled on the rehearsal fixture): duplicate ids
    in a corpus/index multiplied the signature joins on BOTH sides —
    380k candidate rows exploded to 67.8M joined rows (~130s of pure
    join blow-up) and minhash_join emitted duplicate pairs. The index
    is now KEYED by id (min-text-hash representative) and the verify
    paths dedupe signature frames defensively."""

    def _dup_corpus(self, spark, copies=4):
        # 6 distinct docs, each id repeated `copies` times
        rows = []
        for i in range(6):
            text = " ".join(f"tok{i}_{j}" for j in range(30))
            for _ in range(copies):
                rows.append((i, text))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_index_is_keyed_by_id(self, spark):
        from hll_spark.operators.dedup import minhash_index

        idx = minhash_index(self._dup_corpus(spark), "text", "doc_id")
        assert idx.count() == 6
        assert idx.select("doc_id").distinct().count() == 6

    def test_index_rep_is_deterministic_for_conflicting_texts(self, spark):
        from hll_spark.operators.dedup import minhash_index

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta"), (1, "wholly different words"),
             (2, "another doc entirely here")],
            "doc_id long, text string",
        )
        a = minhash_index(df, "text", "doc_id").orderBy("doc_id").collect()
        b = minhash_index(
            df.repartition(7), "text", "doc_id"
        ).orderBy("doc_id").collect()
        assert [r.sig for r in a] == [r.sig for r in b]

    def test_join_emits_each_pair_once_despite_duplicates(self, spark):
        from hll_spark.operators.dedup import minhash_index, minhash_join_index

        corpus = self._dup_corpus(spark, copies=5)
        new = corpus  # same ids/texts: every doc matches itself
        idx = minhash_index(corpus, "text", "doc_id")
        out = minhash_join_index(new, idx, "text", "doc_id").collect()
        pairs = [(r.left_id, r.right_id) for r in out]
        assert sorted(pairs) == sorted(set(pairs)), "duplicate pairs emitted"
        assert set(pairs) == {(i, i) for i in range(6)}

    def test_increment_keepset_unchanged_by_duplication(self, spark):
        from hll_spark.operators.dedup import (
            dedup_increment_index, minhash_index,
        )

        corpus = self._dup_corpus(spark, copies=3)
        novel = spark.createDataFrame(
            [(100, " ".join(f"new{j} fresh{j}" for j in range(20)))] * 4
            + [(0, " ".join(f"tok0_{j}" for j in range(30)))],
            "doc_id long, text string",
        )
        idx = minhash_index(corpus, "text", "doc_id")
        kept = dedup_increment_index(novel, idx, "text", "doc_id")
        rows = kept.collect()
        # id 0 duplicates the corpus -> dropped; all 4 copies of the
        # novel id 100 survive (anti-join preserves input multiplicity)
        assert sorted(r.doc_id for r in rows) == [100] * 4

    def test_unique_ids_flag_same_result_on_unique_corpus(self, spark):
        from hll_spark.operators.dedup import (
            dedup_increment_index, minhash_index,
        )

        corpus = spark.createDataFrame(
            [(i, " ".join(f"c{i}_{j}" for j in range(25))) for i in range(8)],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(100, " ".join(f"c3_{j}" for j in range(25))),
             (101, "totally novel content words here")],
            "doc_id long, text string",
        )
        idx_checked = minhash_index(corpus, "text", "doc_id")
        idx_fast = minhash_index(corpus, "text", "doc_id", unique_ids=True)
        assert sorted(r.sig for r in idx_checked.collect()) == sorted(
            r.sig for r in idx_fast.collect()
        )
        a = dedup_increment_index(new, idx_fast, "text", "doc_id")
        b = dedup_increment_index(
            new, idx_fast, "text", "doc_id", unique_ids=True
        )
        assert sorted(r.doc_id for r in a.collect()) == sorted(
            r.doc_id for r in b.collect()
        ) == [101]
