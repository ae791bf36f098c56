"""Engine operators. Each module cites the reference construct it
re-implements (SURVEY.md §2 inventory IDs in docstrings)."""
