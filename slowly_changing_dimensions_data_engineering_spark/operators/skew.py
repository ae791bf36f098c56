"""Skew mitigation — salted joins and two-phase salted aggregation.

At 100 TB a handful of hot keys (one customer, one event type) can pin
an entire shuffle on one reducer. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin.enabled``, on in session.py) handles
sort-merge JOIN skew at runtime; salting remains the explicit tool for

- **aggregation skew** (AQE does not split a hot groupBy key): salt the
  group key, partially aggregate on (key, salt), then finish on key —
  two small shuffles instead of one straggler;
- joins where the planner lacks runtime stats (non-AQE contexts,
  broadcast-ineligible hot keys): salt the big side, replicate the
  small side once per salt.

Both transforms are results-identical to their naive forms for
algebraic aggregates (sum/count/min/max — associative re-aggregation);
avg composes as sum/count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

SALT = "_salt"

#: Aggregates safe to split into partial + final phases, with their
#: re-aggregation function.
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def with_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic-per-row spread column: hash every column → uniform
    salt (a rand() salt would also work; hashing keeps reruns stable)."""
    return F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_aggregate(df: DataFrame, keys: list[str],
                     aggs: dict[str, tuple[str, str]],
                     n_salts: int = 16) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output column → (agg, input
    column), agg ∈ {sum, count, min, max}. Phase 1 groups by
    (keys…, salt) — a hot key's rows spread over ``n_salts`` reducers —
    phase 2 re-aggregates the ≤ n_salts partials per key.
    """
    partial_cols, final_cols = [], []
    for out, (how, col) in aggs.items():
        if how not in _ALGEBRAIC:
            raise ValueError(f"non-algebraic aggregate {how!r} cannot be salted")
        p, f = _ALGEBRAIC[how]
        partial_cols.append(p(col).alias(f"_p_{out}"))
        final_cols.append(f(f"_p_{out}").alias(out))
    return (
        df.withColumn(SALT, with_salt(df, n_salts))
        .groupBy(*keys, SALT).agg(*partial_cols)
        .groupBy(*keys).agg(*final_cols)
    )


def salted_join(left: DataFrame, right: DataFrame, key: list[str],
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Equi-join with the LEFT (large, skewed) side salted and the RIGHT
    (smaller) side replicated once per salt value, joining on
    (key…, salt). Results are identical to ``left.join(right, key,
    how)`` for 'inner' and 'left' — each left row still meets every
    matching right row exactly once (its own salt's replica).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how for salted_join: {how!r}")
    l = left.withColumn(SALT, with_salt(left, n_salts))
    r = right.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    return l.join(r, key + [SALT], how).drop(SALT)
