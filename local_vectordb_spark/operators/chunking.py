"""Document chunking: the batch form of the reference's Document →
Chunk relationship (/root/reference/src/models/datarecord.py:32-40 —
chunks are pieces of a document's text, created one HTTP POST at a
time there, one distributed pass here).

Plan shape: tokenize once per document (a child projection of the
generator), posexplode the chunk-start sequence, then slice the token
array per output row. No higher-order-function lambda ever captures
the token array, so tokenization cost is O(doc), not O(doc x chunks).
At scale this is a narrow map — no shuffle; chunk rows inherit the
document's partitioning, which is exactly what the downstream
embed-then-index pipeline wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from local_vectordb_spark.functions.text import tokens


def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 50,
    overlap: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split each document into whitespace-token windows of
    ``chunk_size`` tokens advancing by ``chunk_size - overlap``.

    Output: (doc_id, chunk_idx, chunk_text, n_tokens); the final chunk
    may be short; documents shorter than one stride yield one chunk.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    base = docs.select(
        F.col(id_col), tokens(F.col(text_col)).alias("toks")
    ).withColumn("n_toks", F.size("toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.col("n_toks") - overlap, F.lit(1)), F.lit(stride)
    )
    exploded = base.select(
        F.col(id_col),
        F.col("toks"),
        F.posexplode(starts).alias("chunk_idx", "start"),
    )
    piece = F.slice(F.col("toks"), F.col("start"), chunk_size)
    return exploded.select(
        F.col(id_col),
        F.col("chunk_idx"),
        F.concat_ws(" ", piece).alias("chunk_text"),
        F.size(piece).alias("n_tokens"),
    )
