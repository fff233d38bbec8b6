"""Context-length document chunking — split long documents into
consecutive token-budget windows.

Pretraining prep needs documents cut to a model's context length BEFORE
packing (the complement of :mod:`..packing`, which lays already-sized
pieces into fixed slots): a 100k-token page becomes ceil(n/budget)
consecutive chunks, each at most ``max_tokens`` whitespace tokens.

Pure expressions: one tokenize, ``posexplode`` over the chunk count,
one ``slice`` + ``concat_ws`` per chunk — O(n) work per document, no
shuffle at all (chunking rides the scan); deterministic → replayable in
SQL list algebra (gated hash-exact by the driver contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .analysis import word_tokens

__all__ = ["chunk_documents"]


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    max_tokens: int,
    min_tokens: int = 1,
) -> DataFrame:
    """``id_col · chunk_idx · n_tokens · chunk_text`` — consecutive
    whitespace-token windows of at most ``max_tokens`` tokens, in
    document order (``chunk_idx`` 0-based); a trailing chunk shorter
    than ``min_tokens`` is dropped (tail scraps are training noise).
    Chunk text joins tokens with single spaces (token-normalized, like
    the span/line dedup outputs); documents with no tokens emit nothing.
    """
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 1 <= min_tokens <= max_tokens:
        raise ValueError(
            f"min_tokens must be in [1, max_tokens], got {min_tokens}"
        )
    staged = (
        df.where(F.col(text_col).isNotNull())
        .select(
            F.col(id_col).alias("__id"),
            word_tokens(F.col(text_col)).alias("__toks"),
        )
        .where(F.size("__toks") > 0)
    )
    n = F.size("__toks")
    n_chunks = F.ceil(n / F.lit(max_tokens)).cast("int")
    chunks = staged.select(
        "__id",
        "__toks",
        F.posexplode(F.sequence(F.lit(0), n_chunks - 1)).alias(
            "chunk_idx", "__c"
        ),
    ).select(
        F.col("__id").alias(id_col),
        "chunk_idx",
        F.slice(
            "__toks", F.col("chunk_idx") * max_tokens + 1, max_tokens
        ).alias("__chunk"),
    )
    return chunks.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size("__chunk").cast("long").alias("n_tokens"),
        F.concat_ws(" ", "__chunk").alias("chunk_text"),
    ).where(F.col("n_tokens") >= min_tokens)
