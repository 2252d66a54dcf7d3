"""Skew mitigation for joins: key salting (scale-out toolkit).

First line of defense is AQE (``spark.sql.adaptive.skewJoin.enabled`` is on
in the engine session): it splits oversized shuffle partitions at runtime.
Manual salting remains necessary when AQE can't help — a single join key so
hot that one *key* (not partition) overwhelms a task, or deterministic
pre-partitioning is wanted.

The pattern: the big side tags each row with a deterministic salt in
``[0, n_salts)`` derived from the row itself; the small side is replicated
once per salt value; the join key becomes (key, salt), spreading one hot
key over ``n_salts`` reducers. Logical result is identical to the unsalted
join — verified by tests — at the cost of replicating the small side
``n_salts`` times (keep it the dimension side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SUPPORTED = {"inner", "left", "left_outer", "left_semi", "left_anti"}


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on equal-named key columns with the big
    side's hot keys spread across ``n_salts`` reducers.

    Only join types that keep the small side replicable are supported
    (inner / left / left_semi / left_anti): replicating the small side
    would duplicate *unmatched* right rows under right/full joins.
    The salt is ``pmod(hash(all big columns), n_salts)`` — deterministic,
    so retries and oracle replays see the same partitioning.
    """
    if how not in _SUPPORTED:
        raise ValueError(
            f"salted_join supports {sorted(_SUPPORTED)}, got {how!r}"
        )
    salt = F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt)
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = b.join(s, on=[*on, "_salt"], how=how)
    return out.drop("_salt")
