"""Skew-mitigation operators (SURVEY §6).

Two complementary strategies for hot join keys at 100 TB:

- AQE skew-join splitting (enabled in redmap_spark.session) handles
  skew detected *at runtime* by splitting oversized partitions — free,
  but only applies to sort-merge joins and needs accurate stats.
- Explicit key salting (this module) handles skew you know about
  *ahead of time* (power-law user ids, null-heavy foreign keys):
  the big side's hot keys are split across ``n_salts`` sub-keys and
  the small side is replicated n_salts× for those keys, so one
  reducer's hot partition becomes n_salts even ones. Deterministic:
  the salt is a hash of a stable column, not rand(), so replays and
  retries produce identical partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, stable_col: str, n_salts: int, out: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts): hash of a stable unique-ish
    column (NOT rand() — task retries must re-produce the same salt)."""
    return df.withColumn(out, F.pmod(F.xxhash64(stable_col), F.lit(n_salts)).cast("int"))


def replicate_for_salt(df: DataFrame, n_salts: int, out: str = "_salt") -> DataFrame:
    """Explode the (small) side once per salt value so every salted
    partition of the big side finds its match co-located."""
    return df.withColumn(
        out, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    big_stable_col: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``on`` with the shuffle key
    widened to (on, salt). The big side shuffles exactly as before
    (same total volume, n_salts× more even partitions); the small
    side pays n_salts× replication — acceptable by contract (it is
    the *small* side; if it weren't, use AQE skew join instead).

    ``big_stable_col`` seeds the deterministic salt and must vary
    *within* a hot key (a primary key / event id) — salting by the
    join key itself would give every hot-key row the same salt and
    spread nothing. When omitted, the salt hashes the whole row
    (stable, and distinct-rows-spread; duplicates of an identical
    row co-locate, which is harmless).

    Only ``inner`` and ``left`` joins are supported: under
    right/full-outer semantics each unmatched small-side row appears
    once PER REPLICA (n_salts duplicate null-extended rows), which is
    wrong — and salting exists to protect the big side anyway."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports how='inner'/'left' only, got {how!r}: "
            "outer-joining the replicated small side would emit each "
            "unmatched small row n_salts times"
        )
    keys = [on] if isinstance(on, str) else list(on)
    if big_stable_col is not None:
        b = with_salt(big, big_stable_col, n_salts)
    else:
        b = big.withColumn(
            "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)).cast("int")
        )
    s = replicate_for_salt(small, n_salts)
    joined = b.join(s, [*keys, "_salt"], how)
    return joined.drop("_salt")
