"""Property-based SCD2 verification (SURVEY §5 item 4): random supplier
load sequences replayed through the distributed pipeline are checked
against a trivial sequential model implementing the reference MERGE
semantics — including the intentional quirks (composite-key revert
no-op, no delete propagation, null-sensitive change detection).
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from slowly_changing_dimensions_data_engineering_spark import schemas
from slowly_changing_dimensions_data_engineering_spark.operators.merge import merge_upsert
from slowly_changing_dimensions_data_engineering_spark.operators.scd2 import scd2_merge
from slowly_changing_dimensions_data_engineering_spark.store import TableStore

KEY = ["supplier_code"]
SCD2_KEY = ["supplier_code", "supplier_state"]
CMP = ["supplier_state", "supplier_name", "supplier_key"]

# A load = dict code -> (name, state); small alphabets force collisions,
# reverts, and repeated no-op loads.
load_strategy = st.dictionaries(
    keys=st.sampled_from(["A", "B", "C", "D"]),
    values=st.tuples(st.sampled_from(["n1", "n2"]), st.sampled_from(["s1", "s2", "s3"])),
    min_size=1, max_size=4,
)


class SequentialModel:
    """The reference semantics in plain Python (the test oracle)."""

    def __init__(self):
        self.landing: dict[str, tuple[str, str]] = {}
        # staging rows keyed by (code, state): [start, end, flag, name]
        self.staging: list[dict] = []

    def load(self, load: dict, now: dt.datetime) -> None:
        stream = []  # (action, code, name, state)
        for code, (name, state) in sorted(load.items()):
            if code not in self.landing:
                self.landing[code] = (name, state)
                stream.append(("INSERT", code, name, state))
            else:
                old_name, old_state = self.landing[code]
                if (old_name, old_state) != (name, state):  # J3 change guard
                    self.landing[code] = (name, state)
                    stream.append(("DELETE", code, old_name, old_state))
                    stream.append(("INSERT", code, name, state))
        # M2: DELETE closes every matching (code, state); INSERT opens
        # only when (code, state) has no row at all (revert quirk 4a).
        for action, code, name, state in stream:
            matched = [r for r in self.staging
                       if r["code"] == code and r["state"] == state]
            if action == "DELETE" and matched:
                for r in matched:
                    r["end"], r["flag"] = now, "N"
            elif action == "INSERT" and not matched:
                self.staging.append({"code": code, "state": state, "name": name,
                                     "start": now, "end": None, "flag": "Y"})

    def staging_set(self):
        return {(r["code"], r["state"], r["name"], r["start"], r["end"], r["flag"])
                for r in self.staging}


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(loads=st.lists(load_strategy, min_size=1, max_size=3))
def test_random_load_sequences_match_sequential_model(spark, tmp_path_factory, loads):
    root = tmp_path_factory.mktemp("prop")
    store = TableStore(str(root))
    store.create("landing", schemas.SUPPLIER, bucket_by=(KEY, 4))
    store.create("staging", schemas.SUPPLIER_STAGING, bucket_by=(KEY, 4))
    model = SequentialModel()

    for i, load in enumerate(loads):
        now = dt.datetime(2024, 1, 1) + dt.timedelta(days=i)
        df = spark.createDataFrame(
            [Row(supplier_key=ord(c) - 64, supplier_code=c,
                 supplier_name=n, supplier_state=s)
             for c, (n, s) in sorted(load.items())], schemas.SUPPLIER)
        offset = store.get_offset("scd2")
        merge_upsert(store, spark, "landing", df, KEY, CMP)
        stream = store.read_changes(spark, "landing", since=offset)
        if stream is not None:
            scd2_merge(store, spark, "staging", stream, SCD2_KEY, now)
        store.set_offset("scd2", store.version("landing"))
        model.load(load, now)

    got = {(r["supplier_code"], r["supplier_state"], r["supplier_name"],
            r["start_date"], r["end_date"], r["current_flag"])
           for r in store.read(spark, "staging").collect()}
    assert got == model.staging_set()

    # cross-cutting invariants
    rows = store.read(spark, "staging").collect()
    current_per_code = {}
    for r in rows:
        if r["current_flag"] == "Y":
            current_per_code.setdefault(r["supplier_code"], 0)
            current_per_code[r["supplier_code"]] += 1
            assert r["end_date"] is None
        else:
            assert r["end_date"] is not None
            assert r["end_date"] >= r["start_date"]
    assert all(n <= 1 for n in current_per_code.values())

    # landing converged to last-writer-wins state
    landing = {r["supplier_code"]: (r["supplier_name"], r["supplier_state"])
               for r in store.read(spark, "landing").collect()}
    assert landing == model.landing
