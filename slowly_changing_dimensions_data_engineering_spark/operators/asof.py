"""As-of (temporal) join — §2.2 gap operator.

Absent from the reference (its only joins are the merge-embedded
equi-joins, SURVEY.md §2.1 J1/J2); provided here because any event/CDC
engine needs it. Spark has no built-in as-of join, so this is the
canonical composition: co-partition both sides by the ``by`` key
(``groupBy().cogroup()``) and run a vectorized ``pandas.merge_asof``
per group — the same strategy Spark's own docs recommend and the one
that scales: one shuffle per side, then purely local sorted merges, no
range-join explosion.

Determinism contract: callers must ensure at most one right row per
(by, on) value (dedupe first) — with duplicates, which row wins is
engine-specific (pandas picks the last in input order).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    right_on: str,
    by: str,
    right_by: str,
    right_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right[right_on] <= left[on]`` and matching ``by`` key
    (direction='backward'; 'forward' gives the earliest >=).

    Returns left columns + ``right_cols`` (null when no match — left-join
    semantics; filter afterwards for inner).
    """
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
