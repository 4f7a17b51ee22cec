"""Token-window document chunking — training-sequence preparation.

LLM training consumes fixed-length token sequences; long documents are
split into overlapping windows before packing (the GPT/T5 data-prep
convention). Relational formulation: stage the token array once,
posexplode a chunk-index sequence, slice — one narrow projection chain,
no shuffle, no Python.

Window contract: chunk ``i`` covers tokens ``[i*stride, i*stride +
max_tokens)`` with ``stride = max_tokens - overlap``; the number of
chunks is ``ceil(max(n - overlap, 1) / stride)`` (integer arithmetic —
engine-exact), so every token is covered, consecutive chunks share
``overlap`` tokens, and no trailing window is fully contained in the
previous one. Docs with no tokens emit no chunks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import tokens


def chunk_documents(
    docs: DataFrame,
    id_col: str,
    text_col: str = "text",
    max_tokens: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """DF(id, chunk_idx, n_tokens, chunk_text): fixed token windows per
    document (see module docstring for the window contract)."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    base = docs.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("_t")
    ).where(F.size("_t") > 0)
    # integer ceil over a floored-positive numerator (`div` keeps the
    # arithmetic bigint-exact; `/` would be double division)
    n_chunks = F.expr(
        f"(greatest(size(_t) - {overlap}, 1) + {stride - 1}) div {stride}"
    )
    staged = base.select(
        "id", "_t",
        F.explode(F.sequence(F.lit(1), n_chunks)).alias("_i"),
    )
    chunk = F.slice("_t", F.col("_i") * stride - (stride - 1), max_tokens)
    return staged.select(
        "id",
        (F.col("_i") - 1).cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )
