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
