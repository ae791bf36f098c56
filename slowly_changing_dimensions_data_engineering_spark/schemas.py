"""Fixed schema registry.

The reference declares every table schema explicitly
(``SCD-Configuration Setup.sql:14-51``) and its CSVs are headerless with
positional mapping — no inference anywhere. We mirror that: explicit
``StructType`` for every pipeline table and every testdata table.

Type mapping decisions (SURVEY.md §1.2):
- ``NUMBER``        → LongType  (all observed values are small ints)
- ``VARCHAR(n)``    → StringType (length is documentation only)
- ``TIMESTAMP_NTZ`` → TimestampNTZType (wall-clock, no TZ; Spark ≥3.4)
- ``current_flag``  → literal 'Y'/'N' strings, NOT boolean
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference pipeline tables (SCD-Configuration Setup.sql:14-51) -------

#: SUPPLIER_RAW / SUPPLIER_LANDING / SUPPLIER_MASTER
#: (Setup.sql:14-20, 23-29, 45-51 — identical 4-column shape)
SUPPLIER = T.StructType([
    T.StructField("supplier_key", T.LongType()),
    T.StructField("supplier_code", T.StringType()),
    T.StructField("supplier_name", T.StringType()),
    T.StructField("supplier_state", T.StringType()),
])

#: SUPPLIER_STAGING — full SCD2 history (Setup.sql:32-41)
SUPPLIER_STAGING = T.StructType(
    SUPPLIER.fields + [
        T.StructField("start_date", T.TimestampNTZType()),
        T.StructField("end_date", T.TimestampNTZType()),
        T.StructField("current_flag", T.StringType()),
    ]
)

#: CDC stream row shape (golden outputs Setup.sql:130-138, 220-229).
#: METADATA$ACTION ∈ {'INSERT','DELETE'}; an update is a DELETE+INSERT
#: pair with METADATA$ISUPDATE=true (encoding rule Setup.sql:231-232).
CDC_ACTION = "METADATA$ACTION"
CDC_ISUPDATE = "METADATA$ISUPDATE"
CDC_ROW_ID = "METADATA$ROW_ID"


def cdc_schema(base: T.StructType) -> T.StructType:
    return T.StructType(
        base.fields + [
            T.StructField(CDC_ACTION, T.StringType()),
            T.StructField(CDC_ISUPDATE, T.BooleanType()),
            T.StructField(CDC_ROW_ID, T.StringType()),
        ]
    )


SUPPLIER_CDC = cdc_schema(SUPPLIER)

# --- Driver testdata corpus (TESTDATA.md / FIXTURES.md §B) ----------------

TESTDATA_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_testdata(spark, sf_dir: str, *names: str) -> dict:
    """Read driver parquet tables; returns {name: DataFrame}.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects. We read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and convert to a
    microsecond timestamp with integer division (``div`` keeps the full
    int64 precision; a double division would lose sub-µs bits) — the
    same truncation DuckDB applies to nano timestamps.
    """
    from pyspark.sql import functions as F

    names = names or TESTDATA_TABLES
    out = {}
    for n in names:
        path = f"{sf_dir}/{n}.parquet"
        if n == "events":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(path)
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            out[n] = df
        else:
            out[n] = spark.read.parquet(path)
    return out
