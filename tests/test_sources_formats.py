"""Non-CSV sources/sinks (§2.2): parquet is the store's native format
(exercised everywhere); this pins JSON and ORC round-trips with explicit
schemas (never inferSchema — SURVEY §1.1) plus the quoted-CSV format
edge the reference file format declares (FIELD_OPTIONALLY_ENCLOSED_BY).
"""

from __future__ import annotations

from pyspark.sql import Row, types as T

from slowly_changing_dimensions_data_engineering_spark import schemas
from slowly_changing_dimensions_data_engineering_spark.sources.csv import (
    CSV_LOAD_FORMAT, Stage, read_staged_csv,
)

ROWS = [
    Row(supplier_key=1, supplier_code="A'101", supplier_name="N, Inc",
        supplier_state="TS"),
    Row(supplier_key=2, supplier_code="A102", supplier_name=None,
        supplier_state="KA"),
]


def _df(spark):
    return spark.createDataFrame(ROWS, schemas.SUPPLIER)


def test_json_round_trip(spark, tmp_path):
    path = str(tmp_path / "j")
    _df(spark).write.json(path)
    back = spark.read.schema(schemas.SUPPLIER).json(path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in ROWS}


def test_orc_round_trip(spark, tmp_path):
    path = str(tmp_path / "o")
    _df(spark).write.orc(path)
    back = spark.read.schema(schemas.SUPPLIER).orc(path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in ROWS}


def test_csv_quoted_fields(spark, tmp_path):
    """FIELD_OPTIONALLY_ENCLOSED_BY='\\047' (Setup.sql:70): a comma
    inside a single-quoted field must not split."""
    f = tmp_path / "q.csv"
    f.write_text("1,A101,'Name, With Comma',TS\n2,A102,Plain,KA\n")
    stage = Stage(str(tmp_path / "stage"))
    stage.put(str(f))
    df = read_staged_csv(spark, stage, schemas.SUPPLIER)
    rows = {r["supplier_code"]: r["supplier_name"] for r in df.collect()}
    assert rows == {"A101": "Name, With Comma", "A102": "Plain"}
    assert CSV_LOAD_FORMAT["quote"] == "'"


def test_stage_rm(spark, tmp_path):
    """S5 — RM @stage[/file] (SCD-Automation.sql:132): targeted and full
    removal."""
    stage = Stage(str(tmp_path / "rm_stage"))
    a = tmp_path / "a.csv"; a.write_text("1,A,N,S\n")
    b = tmp_path / "b.csv"; b.write_text("2,B,N,S\n")
    stage.put(str(a)); stage.put(str(b))
    assert len(stage.list()) == 2
    stage.rm("a.csv")
    assert [p.split("/")[-1] for p in stage.list()] == ["b.csv"]
    stage.rm()
    assert stage.list() == []


def test_copy_into_validation_and_on_error_modes(spark, tmp_path):
    """Snowflake VALIDATION_MODE / ON_ERROR parity: validate_staged
    returns malformed lines without committing; abort raises and loads
    nothing; skip drops bad ROWS; permissive (reference default) loads
    bad fields as NULLs."""
    import pytest

    from slowly_changing_dimensions_data_engineering_spark.sources.csv import (
        copy_into, validate_staged,
    )
    from slowly_changing_dimensions_data_engineering_spark.store import TableStore

    stage = Stage(str(tmp_path / "stage"))
    good = tmp_path / "good.csv"
    good.write_text("1,S1,Acme,CA\n2,S2,Bolt,NY\n")
    bad = tmp_path / "bad.csv"
    bad.write_text("notanint,S3,Broken,TX\n3,S4,Fine,WA\n")
    stage.put(str(good)); stage.put(str(bad))

    errs = validate_staged(spark, stage, schemas.SUPPLIER)
    assert [r["line"] for r in errs.collect()] == ["notanint,S3,Broken,TX"]
    assert "bad.csv" in errs.head()["file"]

    store = TableStore(str(tmp_path / "store"))
    store.create("t", schemas.SUPPLIER)
    with pytest.raises(ValueError, match="malformed staged rows"):
        copy_into(store, spark, "t", stage, on_error="abort")
    assert store.version("t") == -1  # nothing committed

    v = copy_into(store, spark, "t", stage, on_error="skip")
    assert v == 0
    assert sorted(r["supplier_code"] for r in store.read(spark, "t").collect()) \
        == ["S1", "S2", "S4"]  # malformed ROW dropped

    store.create("p", schemas.SUPPLIER)
    copy_into(store, spark, "p", stage)  # reference default: NULL fields
    rows = {r["supplier_code"]: r["supplier_key"]
            for r in store.read(spark, "p").collect()}
    assert rows["S3"] is None and len(rows) == 4


def test_copy_into_exactly_once_load_history(spark, tmp_path):
    """COPY load-metadata dedup: re-copying the same staged content is a
    no-op (no duplicate rows, no empty commit); FORCE reloads; new
    content still loads; history keys on CONTENT, so the same bytes
    under a new filename are still skipped."""
    from slowly_changing_dimensions_data_engineering_spark.sources.csv import (
        copy_into,
    )
    from slowly_changing_dimensions_data_engineering_spark.store import TableStore

    stage = Stage(str(tmp_path / "stage"))
    f1 = tmp_path / "l1.csv"
    f1.write_text("1,S1,Acme,CA\n")
    stage.put(str(f1))
    store = TableStore(str(tmp_path / "store"))
    store.create("t", schemas.SUPPLIER)

    v1 = copy_into(store, spark, "t", stage, purge=True)
    assert store.read(spark, "t").count() == 1

    # same content, new filename, after purge → skipped entirely
    f2 = tmp_path / "l1_again.csv"
    f2.write_text("1,S1,Acme,CA\n")
    stage.put(str(f2))
    assert copy_into(store, spark, "t", stage) == v1
    assert store.read(spark, "t").count() == 1

    # FORCE reloads the skipped file
    v2 = copy_into(store, spark, "t", stage, force=True)
    assert v2 == v1 + 1 and store.read(spark, "t").count() == 2

    # mixed batch: only the genuinely new file loads
    f3 = tmp_path / "l2.csv"
    f3.write_text("2,S2,Bolt,NY\n")
    stage.put(str(f3))
    copy_into(store, spark, "t", stage)
    assert sorted(r["supplier_code"] for r in store.read(spark, "t").collect()) \
        == ["S1", "S1", "S2"]
