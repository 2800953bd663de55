"""Relational operators Spark lacks as single built-ins.

- as-of join: for each left row, the latest right row with
  right_ts <= left_ts per key. Implemented as the scalable union+window
  pattern (one shuffle on the key, no range explosion): tag sides, union,
  sort within key by (ts, side), carry the last right value forward with
  ``last(..., ignorenulls=True)``. This is the standard formulation that
  survives arbitrarily large sides — no per-key cross product, and the
  single window shuffle is on the join key.
- sessionization: assign gap-based session ids per key with a window
  lag + cumulative sum — the batch analogue of F.session_window, but
  yielding explicit session ids usable by downstream joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row: columns of the latest right row with
    ``right_ts <= left_ts`` within the same ``on`` key (inclusive).

    Rows with no prior right row get nulls. Output: all left columns +
    ``prefix<right_ts>`` + ``prefix<c>`` for each requested right col.

    All requested right columns are carried as ONE struct through a
    single ``last(ignorenulls)`` — carrying each column independently
    would back-fill a NULL field of the latest right row from an older
    right row, mixing values of different rows into one output row.
    Right rows with a NULL ``right_ts`` are not matchable and are
    dropped up front.
    """
    l_tagged = left.withColumn("__side", F.lit(1)).withColumn(
        "__ts", F.col(left_ts)
    )
    # dedupe (right_ts may be requested in right_cols too): duplicate
    # struct field names would make getField ambiguous
    carry_fields = list(dict.fromkeys([right_ts] + list(right_cols)))
    r_tagged = (
        right.where(F.col(right_ts).isNotNull())
        .select(
            F.col(on),
            F.col(right_ts).alias("__ts"),
            F.struct(*[F.col(c) for c in carry_fields]).alias("__r"),
        )
        .withColumn("__side", F.lit(0))
    )
    # align schemas for the union
    r_struct_type = r_tagged.schema["__r"].dataType
    l_tagged = l_tagged.withColumn("__r", F.lit(None).cast(r_struct_type))
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l_tagged.select(*r_tagged.columns).unionByName(
        r_tagged.select(*r_tagged.columns)
    )
    # right rows sort before left rows at equal ts -> inclusive asof
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__r", ignorenulls=True).over(w)
    out = u.select(
        *u.columns,
        *[
            carried.getField(c).alias(f"{prefix}{c}")
            for c in carry_fields
        ],
    ).where(F.col("__side") == 1)
    return out.drop("__side", "__ts", "__r")


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_seconds: int = 3600,
    session_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based sessions: a new session starts when the time
    since the previous event of the same key exceeds ``gap_seconds``.
    Adds ``session_col`` (0-based per key)."""
    w = Window.partitionBy(key).orderBy(F.col(ts).asc())
    # NTZ timestamps cannot cast straight to long; the LTZ hop shifts both
    # operands identically so the gap is timezone-invariant
    epoch = F.col(ts).cast("timestamp_ltz").cast("long")
    prev = F.lag(epoch).over(w)
    is_new = (prev.isNull() | (epoch - prev > gap_seconds)).cast("long")
    return df.withColumn(
        session_col,
        F.sum(is_new).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - 1,
    )


def session_counts(
    df: DataFrame, key: str, ts: str, gap_seconds: int = 3600
) -> DataFrame:
    """Sessions per key: (key, n_sessions)."""
    s = sessionize(df, key, ts, gap_seconds)
    return s.groupBy(key).agg(
        (F.max("session_id") + 1).alias("n_sessions")
    )


def consistent_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    seed: int = 42,
) -> DataFrame:
    """Deterministic hash-based sample: keep a row iff
    ``hash(key) mod 2^20 < fraction * 2^20``.

    Unlike ``df.sample`` this is a pure function of the KEY, so it is
    (a) reproducible across runs/partitionings, and (b) CONSISTENT
    across tables: sampling users at 1% here and events by the same
    user key there yields the complete event history for exactly the
    sampled users — the property training-data subsampling needs.
    Fully JVM-side (xxhash64 + comparison, whole-stage codegen).
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(1 << 20))
    return df.where(bucket < int(fraction * (1 << 20)))


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    bin_width: float,
    on: list[str] | None = None,
) -> DataFrame:
    """Point-in-interval join: rows where ``lo <= point <= hi`` (and the
    optional equi-keys match), WITHOUT a nested-loop plan.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin —
    O(|L|x|R|) comparisons, the classic 100 TB killer. This instead
    bins the domain: each left row lands in bin floor(point/w); each
    interval replicates into the ceil(span/w)+1 bins it overlaps
    (``sequence`` + ``explode``, JVM-side). The join becomes an
    equi-join (hash/SMJ, shuffle on the bin key), with the exact
    predicate re-applied afterwards. Each matching pair is produced
    exactly once (the left row's single bin), so no distinct is needed.

    Pick ``bin_width`` near the typical interval length: replication
    factor is ~span/w + 1 per interval, while an over-wide bin packs
    unrelated rows into one reducer. Intervals with ``hi < lo`` are
    dropped (they can match nothing; dropping also keeps ``sequence``
    ascending). NULL points/bounds never match (inner-join semantics).

    The reference has no join layer (it is a sketch kernel); this
    operator exists for the dataflow the north star wraps around it.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    on = on or []
    dup = (set(left.columns) & set(right.columns)) - set(on)
    if dup:
        raise ValueError(f"ambiguous output columns, rename first: {sorted(dup)}")
    # the bin key is internal; a caller's __bin on EITHER side would be
    # silently overwritten/dropped (ADVICE r3) — refuse loudly instead
    if "__bin" in left.columns or "__bin" in right.columns:
        raise ValueError(
            "range_join reserves the column name '__bin'; rename it on "
            "the input first"
        )
    w = F.lit(float(bin_width))
    l = left.withColumn("__bin", F.floor(F.col(point) / w))
    r = (
        right.where(F.col(lo) <= F.col(hi))
        .withColumn(
            "__bin",
            F.explode(
                F.sequence(F.floor(F.col(lo) / w), F.floor(F.col(hi) / w))
            ),
        )
    )
    cond = [l["__bin"] == r["__bin"]] + [l[k] == r[k] for k in on]
    out = l.join(r, cond).where(
        (F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi))
    )
    for k in on:
        out = out.drop(r[k])
    return out.drop(l["__bin"]).drop(r["__bin"])


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    hot_keys: list | None = None,
    salt: int = 16,
    how: str = "inner",
    min_share: float = 0.05,
    top_n: int = 20,
    mg_k: int = 1024,
) -> DataFrame:
    """Skew-aware equi-join: the executor for ``join_plan_report``'s
    'salted_join' recommendation (diagnostics.py).

    A plain shuffle join hashes every row of both sides by the key; one
    key owning 20% of a 100 TB side means one reducer owns 20 TB — the
    job IS that straggler. This splits both sides by a bounded hot-key
    set and runs two joins:

    - COLD keys: the ordinary equi-join (hash/SMJ) — unchanged.
    - HOT keys: left rows get a uniform salt in [0, salt); right rows
      replicate across ALL salts (``explode`` of a literal array,
      JVM-side). The join key becomes (key, salt), so each formerly
      single-reducer key fans out over ``salt`` reducers. Replication
      cost is |right_hot| * salt rows — bounded because the hot set is
      bounded (top_n), chosen precisely because those keys are huge on
      the LEFT, not the right.

    ``hot_keys=None`` auto-detects via a Misra-Gries pass on the left
    (items with count_lb >= min_share * rows). That costs one sketch
    scan + one count job; at scale, pass the hot set straight from
    ``join_plan_report`` / ``key_skew_report`` instead, which already
    measured it. Hot-key membership compares on the key's STRING form
    (MG items are strings); exotic key types should pass typed
    ``hot_keys`` explicitly.

    Result equals ``left.join(right, on, how)`` row-for-row for
    ``how`` in {'inner', 'left'} (asserted in test_salted_join.py);
    right/full outer would duplicate right-side null rows across salts
    and are refused. The reference has no join layer; this exists for
    the north-star dataflow around the sketches.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    if "__salt" in left.columns or "__salt" in right.columns:
        raise ValueError(
            "salted_join reserves the column name '__salt'; rename it "
            "on the input first"
        )
    dup = (set(left.columns) & set(right.columns)) - {on}
    if dup:
        raise ValueError(f"ambiguous output columns, rename first: {sorted(dup)}")

    if hot_keys is None:
        from .sketches import mg_top_items

        rows = left.count()
        floor_count = max(1, int(min_share * rows))
        tops = mg_top_items(left, on, top_n=top_n, k=mg_k).collect()
        hot_keys = [t["item"] for t in tops if t["count_lb"] >= floor_count]
    hot_keys = list(hot_keys)
    if not hot_keys:
        return left.join(right, on, how)

    # membership on the string form: MG items arrive stringified, and
    # one casted comparison covers int/string keys alike
    hot_strs = [str(k) for k in hot_keys]
    is_hot = F.col(on).cast("string").isin(hot_strs)
    l_hot, l_cold = left.where(is_hot), left.where(~is_hot | F.col(on).isNull())
    r_hot, r_cold = right.where(is_hot), right.where(~is_hot | F.col(on).isNull())

    cold = l_cold.join(r_cold, on, how)

    salt_col = F.pmod(
        F.xxhash64(F.monotonically_increasing_id(), F.lit(on)), F.lit(salt)
    )
    l_salted = l_hot.withColumn("__salt", salt_col)
    r_salted = r_hot.withColumn(
        "__salt", F.explode(F.array([F.lit(i) for i in range(salt)]))
    )
    hot = l_salted.join(r_salted, [on, "__salt"], how).drop("__salt")
    return cold.unionByName(hot)
