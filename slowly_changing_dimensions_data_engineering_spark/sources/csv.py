"""S1-S6 — CSV file format, internal stage, and COPY INTO.

Re-implements the reference's ingest surface:

- S1 file format (``SCD-Configuration Setup.sql:66-71``)::

      CREATE FILE FORMAT csv_load_format
        FIELD_DELIMITER = ','  RECORD_DELIMITER = '\\n'  SKIP_HEADER = 0
        FIELD_OPTIONALLY_ENCLOSED_BY = '\\047'  COMPRESSION = 'AUTO'

  → Spark reader options; gzip is auto-detected by extension, matching
  COMPRESSION='AUTO' (Setup.sql:91 loads a ``.csv.gz``).
- S2 stage (Setup.sql:76-79): a landing directory.
- S3 PUT / S4 LIST / S5 RM (Setup.sql:82,84; SCD-Automation.sql:131-132):
  filesystem ops on the stage dir.
- S6 COPY INTO (Setup.sql:90-92, PURGE=TRUE; :183-185, PURGE=FALSE):
  read every staged file with the format + explicit schema (headerless
  CSVs map positionally — no inference, SURVEY.md §1.1) and commit into
  the RAW table; PURGE deletes source files after a successful load.

Scale notes: ``spark.read.csv(dir)`` parallelizes across files and across
splits of large files; PURGE happens only after the commit lands, so a
failed load never loses input.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: S1 — the reference file format, as Spark DataFrameReader options.
CSV_LOAD_FORMAT = {
    "sep": ",",            # FIELD_DELIMITER = ','
    "lineSep": "\n",       # RECORD_DELIMITER = '\n'
    "header": "false",     # SKIP_HEADER = 0
    "quote": "'",          # FIELD_OPTIONALLY_ENCLOSED_BY = '\047'
    "mode": "PERMISSIVE",
}


class Stage:
    """S2 — named internal stage = a managed landing directory."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def put(self, local_file: str) -> str:
        """S3 — PUT file://… @stage (Setup.sql:82)."""
        dest = os.path.join(self.path, os.path.basename(local_file))
        shutil.copy(local_file, dest)
        return dest

    def list(self) -> list[str]:
        """S4 — LIST @stage (Setup.sql:84)."""
        return sorted(
            os.path.join(self.path, f)
            for f in os.listdir(self.path)
            if os.path.isfile(os.path.join(self.path, f))
        )

    def rm(self, name: str | None = None) -> None:
        """S5 — RM @stage[/file] (SCD-Automation.sql:132)."""
        targets = [os.path.join(self.path, name)] if name else self.list()
        for t in targets:
            if os.path.exists(t):
                os.remove(t)


def read_staged_csv(spark: SparkSession, stage: Stage, schema: T.StructType,
                    files: list[str] | None = None) -> DataFrame:
    files = stage.list() if files is None else files
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.options(**CSV_LOAD_FORMAT).schema(schema).csv(files)


def _file_digest(path: str) -> str:
    """Content MD5, streamed — the identity COPY load history keys on
    (Snowflake skips files whose checksum it already loaded)."""
    import hashlib

    h = hashlib.md5()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def copy_into(store, spark: SparkSession, table: str, stage: Stage,
              purge: bool = False, on_error: str = "permissive",
              force: bool = False) -> int:
    """S6 — COPY INTO table FROM @stage [PURGE=…] [ON_ERROR=…] [FORCE=…].

    A TRUE append: the staged files are committed as a new segment
    without reading or rewriting the table's current contents
    (``TableStore.commit_append``) — standalone-safe regardless of
    whether the caller truncated first, and O(staged bytes) at any
    table size.

    **Exactly-once loads**: the table meta keeps a COPY load history of
    content digests; a staged file whose digest was already loaded is
    SKIPPED (Snowflake's load-metadata dedup — re-running a COPY, or
    re-staging yesterday's file, never duplicates rows). ``force=True``
    reloads regardless (Snowflake FORCE). The history is appended after
    the commit lands, so a crash between the two re-loads that batch —
    at-least-once across crashes, exactly-once in steady state; make
    the downstream merge idempotent (ours is) if that window matters.
    A COPY where every file is skipped is a no-op: no empty commit.

    ``on_error`` maps Snowflake's ON_ERROR copy option:
    ``"permissive"`` (the reference default here: malformed fields load
    as NULLs), ``"skip"`` (ON_ERROR=CONTINUE: malformed ROWS are
    dropped), ``"abort"`` (ON_ERROR=ABORT_STATEMENT: raise with the
    offending lines — found via ``validate_staged`` — and commit
    nothing)."""
    all_files = stage.list()
    digests = {f: _file_digest(f) for f in all_files}
    loaded = set(store._read_meta(table).get("load_history", []))
    files = (all_files if force else
             [f for f in all_files if digests[f] not in loaded])
    if not files:
        if purge:
            for f in all_files:
                os.remove(f)
        return store.version(table)
    if on_error == "abort":
        bad = validate_staged(spark, stage, store.schema(table), files)
        errs = bad.limit(5).collect()
        if errs:
            raise ValueError(
                "COPY INTO aborted, malformed staged rows: "
                + "; ".join(f"{r['file']}: {r['line']!r}" for r in errs))
        df = read_staged_csv(spark, stage, store.schema(table), files)
    elif on_error == "skip":
        if not files:
            df = spark.createDataFrame([], store.schema(table))
        else:
            df = (spark.read.options(**{**CSV_LOAD_FORMAT,
                                        "mode": "DROPMALFORMED"})
                  .schema(store.schema(table)).csv(files))
    else:
        df = read_staged_csv(spark, stage, store.schema(table), files)
    v = store.commit_append(table, df)
    meta = store._read_meta(table)
    meta["load_history"] = sorted(
        set(meta.get("load_history", [])) | {digests[f] for f in files})
    store._write_meta(table, meta)
    if purge:
        for f in all_files:
            os.remove(f)
    return v


def validate_staged(spark: SparkSession, stage: Stage, schema: T.StructType,
                    files: list[str] | None = None) -> DataFrame:
    """``COPY INTO … VALIDATION_MODE = 'RETURN_ERRORS'`` — parse the
    staged files and return the MALFORMED rows (source file + raw line)
    without committing anything. PERMISSIVE parse with a corrupt-record
    column; a row is malformed when the line cannot bind to the declared
    schema (arity/type). Spark disallows projecting ONLY the corrupt
    column from a CSV scan, so the filter keeps a real column in the
    projection set."""
    from pyspark.sql import functions as F

    files = stage.list() if files is None else files
    if not files:
        return spark.createDataFrame([], "file string, line string")
    # Read lines as TEXT and parse each with from_csv: a raw CSV scan
    # refuses queries that reference only its corrupt-record column
    # (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — and column
    # pruning reduces this projection to exactly that), while the text
    # route keeps the raw line in hand for the error report anyway.
    aug = T.StructType(list(schema.fields)
                       + [T.StructField("_corrupt_record", T.StringType())])
    opts = {k: v for k, v in CSV_LOAD_FORMAT.items()
            if k in ("sep", "quote")}
    opts["columnNameOfCorruptRecord"] = "_corrupt_record"
    parsed = F.from_csv(F.col("value"), F.lit(aug.simpleString()), opts)
    return (spark.read.text(files)
            .select(F.input_file_name().alias("file"),
                    F.col("value").alias("line"),
                    parsed.alias("_p"))
            .filter(F.col("_p._corrupt_record").isNotNull())
            .select("file", "line"))
