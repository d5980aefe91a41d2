"""Training-data pipeline operators (dedup / similarity / text / multimodal).

These extend the reference's capability surface with the operations a
large-scale (100 TB) token-pipeline needs; each has a queries() entry and a
DuckDB oracle in __spark_entry__.py. All hot paths are JVM column
expressions; Python appears only in Arrow-vectorized form.
"""
