"""Sources & sinks: Spark-first mappings of the reference's consumer API
(SURVEY.md §2.1 S1-S6)."""
