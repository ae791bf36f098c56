"""Range (interval) join — §2.2 gap operator (range/as-of row).

``interval_join`` attaches to each left row the right rows whose
``[start, end)`` interval contains the left timestamp, with optional
equi-keys. Spark plans a naive ``t >= start AND t < end`` theta join as
broadcast-nested-loop (quadratic at scale); this operator rewrites it as
the standard **interval bucketing** shape:

- each right interval explodes into the coarse time buckets it overlaps
  (``sequence()`` of bucket ids — one row per bucket, JVM-side);
- each left row computes its single bucket id;
- the join is a plain EQUI join on (keys…, bucket id) — hash shuffle on
  uniform keys, AQE-sized — followed by the exact containment predicate.

Cost: |right| × (interval/bucket) exploded rows instead of |L|×|R|
comparisons. Pick ``bucket_seconds`` near the median interval length so
the explode factor stays ~1-2; a left row always joins at most one copy
of an interval (its bucket occurs once per interval), so no dedup is
needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(c: Column, width_us: int) -> Column:
    return F.floor(F.unix_micros(c.cast("timestamp")) / F.lit(width_us))


def interval_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    start_col: str,
    end_col: str,
    by: list[tuple[str, str]] | None = None,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join left rows to right intervals containing their timestamp.

    ``by`` is a list of (left_col, right_col) equi-key pairs.
    ``end_col`` is EXCLUSIVE. ``how`` is 'inner' or 'left'.
    Output: all left columns + all right columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how: {how!r}")
    width = bucket_seconds * 1_000_000
    by = by or []

    r = right.withColumn(
        "_bid",
        F.explode(F.sequence(
            _bucket(F.col(start_col), width),
            # end is exclusive: an interval ending ON a bucket boundary
            # does not reach into that bucket
            F.floor((F.unix_micros(F.col(end_col).cast("timestamp")) - 1)
                    / F.lit(width)),
        )),
    )
    l = left.withColumn("_bid", _bucket(F.col(time_col), width))

    la, ra = l.alias("l"), r.alias("r")
    cond = (F.col("l._bid") == F.col("r._bid"))
    for lc, rc in by:
        cond = cond & (F.col(f"l.{lc}") == F.col(f"r.{rc}"))
    refine = (
        (F.col(f"l.{time_col}") >= F.col(f"r.{start_col}").cast("timestamp"))
        & (F.col(f"l.{time_col}") < F.col(f"r.{end_col}").cast("timestamp"))
    )
    # 'left' rides the SAME single join: a left-outer theta join emits an
    # unmatched left row exactly once (null-padded right side), and a
    # matched left row once per containing interval (its bucket id hits
    # exactly one exploded copy of each interval), so no restore pass is
    # needed. This is also null/dup-safe: no equality on left columns, so
    # NULL-bearing or duplicated left rows cannot be double-emitted.
    return la.join(ra, cond & refine, how).select(
        *[F.col(f"l.{c}") for c in left.columns],
        *[F.col(f"r.{c}") for c in right.columns],
    )
