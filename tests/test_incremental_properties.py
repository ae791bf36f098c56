"""Property-based incremental-MV verification: random interleavings of
merge loads and predicate deletes, with an MV refresh after EVERY
operation, must keep the signed CDC fold equal to a full recompute of
the base at every step — the invariant the stream ≡ snapshot-delta
contract exists to guarantee (including updates that move rows between
groups, emptied groups, dup-key loads, and no-op batches).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row, functions as F

from slowly_changing_dimensions_data_engineering_spark import schemas
from slowly_changing_dimensions_data_engineering_spark.operators.incremental import (
    refresh_aggregate,
)
from slowly_changing_dimensions_data_engineering_spark.operators.merge import (
    delete_where, merge_upsert,
)
from slowly_changing_dimensions_data_engineering_spark.store import TableStore

KEY = ["supplier_code"]
CMP = ["supplier_state", "supplier_name", "supplier_key"]

# An op is a merge load (dict code -> state, some rows tombstoned via
# WHEN MATCHED DELETE) or a delete of one state. Tiny alphabets force
# group churn, re-inserts after delete, no-ops, and unmatched tombstones.
merge_op = st.tuples(
    st.dictionaries(
        keys=st.sampled_from(["A", "B", "C", "D"]),
        values=st.sampled_from(["s1", "s2", "s3"]),
        min_size=1, max_size=4,
    ),
    st.sets(st.sampled_from(["A", "B", "C", "D"]), max_size=2),
).map(lambda t: ("merge", t))
delete_op = st.sampled_from(["s1", "s2", "s3"]).map(lambda s: ("delete", s))
ops_strategy = st.lists(st.one_of(merge_op, delete_op), min_size=1, max_size=6)

_CODE_KEY = {"A": 1, "B": 2, "C": 3, "D": 4}


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(ops=ops_strategy)
def test_mv_equals_recompute_after_every_op(spark, tmp_path_factory, ops):
    store = TableStore(str(tmp_path_factory.mktemp("mvprop")))
    store.create("base", schemas.SUPPLIER)

    for kind, arg in ops:
        if kind == "merge":
            load, tombs = arg
            rows = [Row(supplier_key=_CODE_KEY[c], supplier_code=c,
                        supplier_name=f"n{c}", supplier_state=s)
                    for c, s in sorted(load.items())]
            codes = "', '".join(sorted(tombs)) or "NONE"
            merge_upsert(store, spark, "base",
                         spark.createDataFrame(rows, schemas.SUPPLIER),
                         KEY, CMP,
                         delete_match=f"supplier_code IN ('{codes}')")
        else:
            delete_where(store, spark, "base",
                         f"supplier_state = '{arg}'", KEY)
        refresh_aggregate(store, spark, "mv", "base", "mv",
                          ["supplier_state"], {"sum_key": "supplier_key"})

        # the MV materializes on the first change batch; a no-change
        # prefix (e.g. deleting from an empty base) leaves it absent
        mv = {} if not store.exists("mv") else {
            r["supplier_state"]: (r["n_rows"], r["sum_key"])
            for r in store.read(spark, "mv").collect()}
        full = {r["supplier_state"]: (r["n"], r["s"])
                for r in store.read(spark, "base")
                .groupBy("supplier_state")
                .agg(F.count("*").alias("n"),
                     F.sum("supplier_key").alias("s")).collect()}
        assert mv == full, (ops, kind, arg)
