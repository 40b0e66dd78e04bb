"""Document chunking — fixed-size word windows for training-data prep.

Two implementations with identical output:

- ``ChunkWords``: a Python UDTF (table function) applied via
  ``DataFrame.lateralJoin``. This completes the §2.11 UDF/UDAF/UDTF
  surface (the reference has none — SURVEY §2.11); UDTFs are the
  per-row fan-out escape hatch when chunking logic outgrows SQL
  (tokenizer-aware boundaries, overlap windows, markup stripping).
- ``chunk_documents_builtin``: pure built-in expressions (split +
  sequence + slice) — JVM-side, whole-stage-codegen, the hot path for
  the simple fixed-size rule. Prefer this form at 100 TB; the UDTF
  form costs one Arrow round-trip per batch.

Both are narrow (no shuffle): chunking is a per-row generator, so the
plan stays a scan -> project/generate pipeline whatever the scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

CHUNK_SIZE = 32


@udtf(returnType="chunk_id: bigint, n_words: int, chunk: string", useArrow=True)
class ChunkWords:
    """Split single-space-tokenized text into fixed-size word chunks.

    Yields (chunk_id, n_words, chunk); the last chunk may be short.
    Matches ``chunk_documents_builtin`` word-for-word.
    """

    def eval(self, text: str, chunk_size: int):  # noqa: D102
        toks = text.split(" ")
        for i in range(0, len(toks), chunk_size):
            part = toks[i : i + chunk_size]
            yield (i // chunk_size, len(part), " ".join(part))


def chunk_documents_udtf(
    docs: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk via the Python UDTF (lateral join) — §2.11 surface.

    ``useArrow=True`` on the decorator: without it the UDTF plans as
    row-at-a-time pickled BatchEvalPythonUDTF — the slow path the
    engine bans everywhere else; with it, rows move in Arrow batches
    (ArrowEvalPythonUDTF) like every other sanctioned Python boundary.
    The session conf alone is not enough — arrow-ness is resolved at
    decoration time."""
    return docs.lateralJoin(
        ChunkWords(F.col(text_col).outer(), F.lit(chunk_size))
    ).select(id_col, "chunk_id", "n_words", "chunk")


def chunk_documents_builtin(
    docs: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk via built-in expressions only (the 100 TB hot path)."""
    toks = docs.select(
        F.col(id_col), F.split(F.col(text_col), " ", -1).alias("_toks")
    )
    n_chunks = F.ceil(F.size("_toks") / F.lit(float(chunk_size))).cast("long")
    piece = F.slice(
        F.col("_toks"),
        (F.col("chunk_id") * chunk_size + 1).cast("int"),
        chunk_size,
    )
    return (
        toks.select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_id"
            ),
            "_toks",
        )
        # materialize the slice once so n_words/chunk don't re-slice
        .select(F.col(id_col), "chunk_id", piece.alias("_piece"))
        .select(
            F.col(id_col),
            "chunk_id",
            F.size("_piece").alias("n_words"),
            F.array_join("_piece", " ").alias("chunk"),
        )
    )
