"""Sources — the reference input layer (SURVEY.md §2.1) on Spark readers."""
