"""Text embedding: mean of per-word vectors (A5/G7).

The reference embeds text as the average of GoogleNews-300 word vectors —
except its loop is buggy: it OVERWRITES the accumulator instead of adding
(``feature_vec = np.add(...)`` assigns the current word's vector at
db/models.py:43), so what ships is ``last_word_vector / n_words``. Per
SURVEY.md §7 risk (c), the INTENDED semantics (true mean) is the default
here; the buggy variant is provided explicitly so the deviation is
documented and testable, never silently copied.

Word vectors are md5-derived (dim x seeded hash -> [-1, 1]) so any engine
reproduces them exactly — the stand-in for a broadcast embedding table.
Everything is built-in higher-order functions (no UDF): the per-token
vector is a ``transform`` over dimension indexes, the mean is
``aggregate`` + ``zip_with``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DIM = 4


def _tokens(col) -> Column:
    return F.filter(F.split(F.trim(F.lower(col)), r"\s+"),
                    lambda t: t != "")


def word_vector(tok: Column, dim: int = DIM) -> Column:
    """Deterministic pseudo-embedding: component j = (md5-derived 32-bit
    int of f'{j}:{tok}') / 2^31 - 1.0 in [-1, 1)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.conv(F.substring(F.md5(F.concat(
            j.cast("string"), F.lit(":"), tok)), 1, 8), 16, 10)
        .cast("double") / F.lit(2147483648.0) - F.lit(1.0))


def avg_feature_vector(text: Column, dim: int = DIM) -> Column:
    """True mean of word vectors (the INTENDED reference semantics)."""
    toks = _tokens(text)
    n = F.size(toks)
    summed = F.aggregate(
        toks,
        F.array_repeat(F.lit(0.0), dim),
        lambda acc, t: F.zip_with(acc, word_vector(t, dim),
                                  lambda a, b: a + b))
    return F.when(n > 0, F.transform(
        summed, lambda x: F.round(x / n, 6))).otherwise(
        F.array_repeat(F.lit(0.0), dim))


def avg_feature_vector_reference_buggy(text: Column,
                                       dim: int = DIM) -> Column:
    """The literal reference behavior (db/models.py:43): accumulator is
    overwritten each word -> last word's vector / n_words. Provided for
    documentation/tests only; do NOT use for real embeddings."""
    toks = _tokens(text)
    n = F.size(toks)
    last = F.element_at(toks, -1)
    return F.when(n > 0, F.transform(
        word_vector(last, dim),
        lambda x: F.round(x / n, 6))).otherwise(
        F.array_repeat(F.lit(0.0), dim))


def embed_documents(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", dim: int = DIM) -> DataFrame:
    return docs.select(
        id_col, avg_feature_vector(F.col(text_col), dim).alias("embedding"))
