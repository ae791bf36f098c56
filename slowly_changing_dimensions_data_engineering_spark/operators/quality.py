"""Data-quality expectations — the validation gate between ingestion
and consumption (dbt tests / Delta constraints / DLT expectations, as a
one-pass operator).

A pipeline feeding a 100 TB training corpus (or the SCD2 landing zone)
needs declarative row contracts: NOT NULL, accepted values, ranges,
referential integrity, key uniqueness. ``check_expectations`` evaluates
ALL rules in ONE aggregate pass — per-rule violation counts are
conditional sums inside a single scan (no per-rule job, no shuffle
beyond the final 1-row aggregate), then the one summary row unpivots to
a (rule, n_violations) long form driver-side-free via ``stack``.

Rules are Columns over the input frame, so cross-table rules
(foreign keys, uniqueness) compose by ATTACHING evidence columns first
(a left-join existence flag, a per-key count) and referencing them in
the predicate — the join cost is explicit at the call site, the check
itself stays one pass.

NULL semantics: a rule predicate evaluating to NULL counts as a
VIOLATION (SQL constraints treat unknown as not-satisfied-for-checks;
a NULL o_custkey must fail `o_custkey IS NOT NULL`-style rules rather
than vanish).

No reference parity: the reference pipeline has no validation surface
beyond COPY's ON_ERROR; this is engine surface its users gain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def check_expectations(df: DataFrame,
                       rules: dict[str, Column | str]) -> DataFrame:
    """Evaluate row-level expectations; returns one row per rule:
    (rule, n_rows, n_violations, pass_frac 0..1 rounded to 6).
    Rule order in the output follows dict insertion order."""
    if not rules:
        raise ValueError("check_expectations: no rules given")
    bad = [n for n in rules if not n.replace("_", "").isalnum()]
    if bad:
        # rule names are spliced into a stack() selectExpr — restrict to
        # identifier-safe names rather than escaping.
        raise ValueError(f"check_expectations: rule names must be "
                         f"alphanumeric/underscore: {bad}")
    preds = {n: (F.expr(p) if isinstance(p, str) else p)
             for n, p in rules.items()}
    aggs = [F.count("*").alias("_n")]
    for name, p in preds.items():
        ok = F.coalesce(p.cast("boolean"), F.lit(False))
        aggs.append(F.sum((~ok).cast("long")).alias(f"_v_{name}"))
    one = df.agg(*aggs)
    pairs = ", ".join(f"'{n}', coalesce(_v_{n}, 0L)" for n in preds)
    long = one.selectExpr(
        "_n", f"stack({len(preds)}, {pairs}) AS (rule, n_violations)")
    # Empty-input contract: sum() over zero rows is NULL — coalesce each
    # count to 0 and define pass_frac = 1.0 on an empty frame so a gate
    # like `n_violations == 0` PASSES an empty micro-batch explicitly
    # instead of evaluating NULL (vacuous truth, the DLT convention).
    return long.select(
        "rule", F.col("_n").alias("n_rows"), "n_violations",
        F.when(F.col("_n") > 0,
               F.round((F.col("_n") - F.col("n_violations")) / F.col("_n"), 6))
         .otherwise(F.lit(1.0)).alias("pass_frac"))
