"""As-of (temporal) join — §2.2 gap operator.

Absent from the reference (its only joins are the merge-embedded
equi-joins, SURVEY.md §2.1 J1/J2); provided here because any event/CDC
engine needs it. Spark has no built-in as-of join; two strategies:

- ``strategy="window"`` (default): union both sides tagged with a
  side marker, one shuffle+sort on (key, time, side), and a running
  ``last(right_payload, ignorenulls=True)`` window — entirely JVM-side
  whole-stage-codegen, no range-join explosion, ~10× the throughput of
  the Python path (the right payload is packed into ONE struct column
  so a legitimately-NULL right field can't leak an older value through
  ignorenulls).
- ``strategy="pandas"``: co-partition both sides by the ``by`` key
  (``groupBy().cogroup()``) and run a vectorized ``pandas.merge_asof``
  per group — kept as the reference implementation and for ``by``-less
  or nearest-direction variants merge_asof supports.

Determinism contract: callers must ensure at most one right row per
(by, on) value (dedupe first) — with duplicates, which row wins is
engine-specific (pandas picks the last in input order).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str,
    by: str,
    right_by: str,
    right_cols: list[str],
    direction: str = "backward",
    strategy: str = "window",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_on] <= left[on]`` and matching ``by`` key
    (direction='backward'; 'forward' gives the earliest >=).

    Returns left columns + ``right_cols`` (null when no match — left-join
    semantics; filter afterwards for inner).
    """
    # A NULL right key can never legally match (pandas.merge_asof rejects
    # null keys outright); drop such rows up front so BOTH strategies
    # agree. In the window strategy a null __t would otherwise sort first
    # (nulls_first + side tiebreak) and its payload would be carried by
    # the running last() into every left row before the first real right
    # row; in the pandas strategy merge_asof would raise.
    right = right.filter(F.col(right_on).isNotNull())
    if strategy == "window":
        return _asof_window(left, right, on, right_on, by, right_by,
                            right_cols, direction)
    from pyspark.sql import types as T
    lcols = left.columns
    # Appended right-side fields must be nullable: unmatched left rows get
    # nulls (left-join semantics) regardless of the source field's flag.
    out_fields = [left.schema[c] for c in lcols] + [
        T.StructField(right.schema[c].name, right.schema[c].dataType, True)
        for c in right_cols
    ]
    schema = T.StructType(out_fields)

    r = right.select(right_by, right_on, *[c for c in right_cols if c not in (right_by, right_on)])

    def merge(l: pd.DataFrame, rg: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in schema.fields])
        l = l.sort_values(on, kind="mergesort")
        # normalize datetime units (Arrow may hand us us-precision)
        l[on] = pd.to_datetime(l[on]).astype("datetime64[ns]")
        if rg.empty:
            out = l.copy()
            for c in right_cols:
                out[c] = None
            return out[[f.name for f in schema.fields]]
        rg = rg.sort_values(right_on, kind="mergesort")
        rg[right_on] = pd.to_datetime(rg[right_on]).astype("datetime64[ns]")
        merged = pd.merge_asof(
            l, rg.rename(columns={right_on: "__r_on"}), left_on=on, right_on="__r_on",
            direction=direction, suffixes=("", "__r"),
        )
        for c in right_cols:
            if c == right_on:
                merged[c] = merged["__r_on"]
            elif c + "__r" in merged.columns:
                merged[c] = merged[c + "__r"]
        return merged[[f.name for f in schema.fields]]

    return (
        left.groupBy(by)
        .cogroup(r.groupBy(right_by))
        .applyInPandas(merge, schema=schema)
    )


def _asof_window(left: DataFrame, right: DataFrame, on: str, right_on: str,
                 by: str, right_by: str, right_cols: list[str],
                 direction: str) -> DataFrame:
    """Union-and-running-last formulation (module docstring). One shuffle
    on the ``by`` key; at equal timestamps the right row sorts first, so
    ``right_on <= on`` ties match (mirroring merge_asof's inclusive
    bound)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction: {direction!r}")
    lcols = left.columns
    payload = F.struct(*[F.col(c) for c in right_cols]).alias("__r")
    r_side = right.select(
        F.col(right_by).alias("__k"),
        F.col(right_on).cast(left.schema[on].dataType).alias("__t"),
        F.lit(0).alias("__side"),
        payload,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    null_payload = F.lit(None).cast(
        r_side.schema["__r"].dataType).alias("__r")
    l_side = left.select(
        F.col(by).alias("__k"),
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        null_payload,
        *lcols,
    )
    # Null left timestamps must sort BEFORE every right row in both
    # directions, so the running last() gives them no match (a plain
    # desc sort puts nulls last, where they would inherit the final
    # right payload).
    ordering = [F.col("__t").asc_nulls_first(), F.col("__side").asc()] \
        if direction == "backward" \
        else [F.col("__t").desc_nulls_first(), F.col("__side").asc()]
    w = (Window.partitionBy("__k").orderBy(*ordering)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    merged = (
        l_side.unionByName(r_side)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    return merged.select(
        *lcols,
        *[F.col("__match")[c].alias(c) for c in right_cols],
    )
