"""Training-data curation operators: sequence packing + deterministic
stratified sampling.

Both are pure Column-expression pipelines (zero Python in the row path,
single-shuffle plans) designed for the 100 TB corpus case:

- ``pack_chunks`` is the concat-then-chunk packing an LLM pretraining
  pipeline applies before batching: documents are concatenated in a
  deterministic order and the token stream is cut into fixed-budget
  chunks; each document's chunk assignment and offset fall out of ONE
  ordered-window cumulative sum. The well-known scale trap is that a
  per-``source`` ordered window funnels every row of one source through
  one task — so the operator packs per (source, shard) with
  ``shard = doc_id % n_shards``: parallelism is source_count x n_shards
  regardless of how skewed the source sizes are, and the assignment stays
  deterministic and engine-portable (plain modulo, no engine hash).
- ``stratified_sample`` is deterministic hash sampling with a per-stratum
  rate: keep a row iff a fixed-width md5 prefix of its id falls below the
  stratum's threshold. No RNG state, no seed plumbing, reproducible
  across engines and runs, and filter-pushdown-friendly (a pure predicate
  — no shuffle at all). md5 hex prefixes are uniform, so the realized
  rate converges to ceil(rate * 16^width) / 16^width.

Neither exists in the reference (it has no corpus tooling); they extend
the LLM-pipeline suite (SURVEY.md training-data extensions) the same way
ops/dedup.py and ops/text.py do.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def pack_chunks(
    docs: DataFrame,
    budget: int,
    *,
    id_col: str = "doc_id",
    token_count: Column | None = None,
    part_cols: tuple[str, ...] = ("source",),
    n_shards: int = 16,
) -> DataFrame:
    """Concat-then-chunk packing: within each (part_cols, shard) stream,
    documents ordered by ``id_col`` are laid end-to-end and the token
    stream is cut every ``budget`` tokens.

    Returns one row per document: part_cols + shard, doc_id, n_tok,
    begin_off (absolute token offset of the doc in its stream),
    first_chunk / chunk_off (chunk index and in-chunk offset where the doc
    starts), last_chunk (chunk index where it ends — a doc may straddle
    chunks, which is exactly what pretraining packing does).

    ``token_count`` defaults to the whitespace token count of ``text``
    (matching ops/text.token_stats); pass any integral Column to pack by
    a different budget unit (chars, bytes, BPE estimate).

    Scale shape: ONE shuffle (hash on part_cols+shard), then an ordered
    window scan per shard. n_shards bounds the longest single-task scan at
    ~corpus_bytes / (sources x n_shards); raise it for skewed sources —
    the chunking stays deterministic because the shard is derived from
    doc_id, not from the physical partitioning.
    """
    from pyspark.sql.window import Window

    # \S+ runs, matching ops/text.token_stats.n_ws_tokens exactly — a
    # split-based count would add +1 per leading/trailing-whitespace side
    # and count '' as one token, silently shifting every later offset
    n_tok = (
        token_count
        if token_count is not None
        else F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\S+"), 0))
    ).cast("bigint")
    shard = (F.col(id_col) % F.lit(int(n_shards))).cast("bigint")
    parts = [*part_cols, "shard"]
    w = Window.partitionBy(*parts).orderBy(id_col)
    begin = (F.sum("n_tok").over(w) - F.col("n_tok")).alias("begin_off")
    b = F.lit(int(budget))
    out = (
        docs.select(*part_cols, F.col(id_col), n_tok.alias("n_tok"))
        .withColumn("shard", shard)
        .withColumn("begin_off", begin)
        .withColumn("first_chunk", F.expr(f"begin_off div {int(budget)}"))
        .withColumn("chunk_off", F.col("begin_off") % b)
        .withColumn(
            "last_chunk",
            F.expr(f"(begin_off + n_tok - 1) div {int(budget)}"),
        )
    )
    return out.select(
        *part_cols, "shard", id_col, "n_tok", "begin_off",
        "first_chunk", "chunk_off", "last_chunk",
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    *,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
    prefix_width: int = 4,
) -> DataFrame:
    """Deterministic per-stratum hash sampling: keep a row iff
    ``md5(cast(id)) hex prefix < threshold(stratum)`` where the threshold
    encodes the stratum's rate over the 16^prefix_width prefix space.

    Purely a filter predicate — no shuffle, no RNG, engine-portable (the
    DuckDB oracle computes the identical md5 prefix), stable under
    repartitioning and re-runs. Rates quantize to 1/16^prefix_width
    (1/65536 at the default width).
    """
    space = 16 ** prefix_width
    prefix = F.substring(F.md5(F.col(id_col).cast("string")), 1, prefix_width)

    def threshold(rate: float) -> str:
        q = min(space, max(0, int(round(rate * space))))
        if q >= space:
            # 'g' sorts above every hex prefix — rate 1.0 keeps ALL rows
            # ('1' + '0'*width would sort BELOW prefixes starting >= '2')
            return "g"
        return format(q, f"0{prefix_width}x")

    expr = F.lit(threshold(default_rate))
    for stratum, rate in sorted(rates.items()):
        expr = F.when(
            F.col(stratum_col) == F.lit(stratum), F.lit(threshold(rate))
        ).otherwise(expr)
    return df.where(prefix < expr)
