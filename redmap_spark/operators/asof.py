"""General as-of join operator (the reusable form of q_asof_join).

``asof_join(left, right, ...)``: for every left row, attach the most
recent right row with the same key whose timestamp is ≤ (or <) the
left timestamp — the canonical point-in-time lookup (trades joined to
quotes, orders to latest price, events to latest profile snapshot).

Strategy: union + carry-forward. Both sides are tagged and unioned,
then one window per key carries the latest right-side payload forward
in time order; left rows read it off. Exactly ONE shuffle on the key,
no range-join row explosion, no per-row binary search — at 100 TB
this is the difference between a plan that finishes and one that
doesn't (a naive range join on (key, t_right ≤ t_left) fans out to
|left| × |right-per-key|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RESERVED = ("_k", "_t", "_is_left", "_tb")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: tuple[str, ...],
    strict: bool = False,
) -> DataFrame:
    """Returns ``left`` with ``payload`` columns (nullable) from the
    latest matching right row. ``strict=True`` uses t_right < t_left
    instead of ≤ (ties: a right row at the exact left timestamp does
    NOT match).

    Determinism: right rows sharing the same timestamp resolve by a
    stable content hash of their payload (an arbitrary but
    run-invariant order), so repeated runs carry the same payload.
    Reserved internal names (_k/_t/_is_left/_tb) and payload names that
    collide with left columns are rejected up front instead of silently
    clobbering output columns."""
    clash = set(_RESERVED) & (set(left.columns) | set(right.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves column names {sorted(clash)}; rename them first"
        )
    payload_clash = set(payload) & set(left.columns)
    if payload_clash:
        raise ValueError(
            f"payload columns {sorted(payload_clash)} collide with left columns; "
            "alias them on the right side first"
        )
    lt = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(0).cast("long").alias("_tb"),
        "*",
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
    ).drop(on, left_ts)
    rt = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        # stable within-timestamp tiebreak: content hash of the carried
        # payload — equal-_t right rows order the same way every run
        F.xxhash64(*[F.col(c) for c in payload]).alias("_tb"),
        *[F.lit(None).cast(f.dataType).alias(f.name) for f in left.schema if f.name not in (on, left_ts)],
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    unioned = lt.unionByName(rt)
    # strict: left rows sort BEFORE right rows at equal _t (so they
    # don't see them); non-strict: right rows sort first.
    tie = F.col("_is_left").asc() if not strict else F.col("_is_left").desc()
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t").asc(), tie, F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in payload
        ],
    )
    out = carried.filter(F.col("_is_left") == 1).select(
        F.col("_k").alias(on),
        F.col("_t").alias(left_ts),
        *[f.name for f in left.schema if f.name not in (on, left_ts)],
        *[F.col(f"_asof_{c}").alias(c) for c in payload],
    )
    return out
