"""Structured-Streaming surface: windows, stateful dedup, incremental
closure pipeline, exactly-once sink (SURVEY.md section 2.7)."""
