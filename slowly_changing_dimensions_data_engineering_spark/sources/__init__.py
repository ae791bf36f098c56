"""Sources & sinks: CSV stage (reference S1-S6) + generic parquet/json."""
