"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo
``phaniram05/Slowly-Changing-Dimensions-Data-Engineering``
(a Snowflake-SQL SCD Type-2 CDC pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory + engine configs
- ``schemas``    : fixed StructType registry (reference tables + testdata)
- ``store``      : versioned parquet table store (snapshot isolation,
                   time travel, change streams) — the Delta-less lakehouse
                   substrate the pipeline runs on
- ``operators/`` : merge/upsert (M1), SCD2 merge (M2), CDC diff (C1-C3),
                   dedup, similarity, text analysis, as-of joins
- ``sources/``   : CSV file-format + stage (S1-S6), parquet
- ``pipeline``   : the 5-step task DAG (T1-T4) batch + streaming variants

Reference parity map lives in SURVEY.md §2; every operator docstring cites
the reference file:line it re-implements.
"""

__version__ = "0.1.0"
