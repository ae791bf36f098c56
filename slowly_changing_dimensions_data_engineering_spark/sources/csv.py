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


def copy_into(store, spark: SparkSession, table: str, stage: Stage,
              purge: bool = False) -> int:
    """S6 — COPY INTO table FROM @stage [PURGE=…].

    A TRUE append: the staged files are committed as a new segment
    without reading or rewriting the table's current contents
    (``TableStore.commit_append``) — standalone-safe regardless of
    whether the caller truncated first, and O(staged bytes) at any
    table size."""
    files = stage.list()
    df = read_staged_csv(spark, stage, store.schema(table), files)
    v = store.commit_append(table, df)
    if purge:
        for f in files:
            os.remove(f)
    return v
