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

import numpy as np
import pandas as pd
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


# --- real-model seam (r3 verdict "missing #1") ------------------------------

W2V_NPZ_ENV = "MEMEX_KG_W2V_NPZ"

_W2V_CACHE: dict = {}  # per-Python-worker model cache: the npz is read
# from disk at most once per worker process, then reused across every
# Arrow batch — the broadcast-model pattern (the reference loads the
# GoogleNews-300 KeyedVectors once per process the same way,
# db/models.py:20-27).


def _load_word_vectors(path: str):
    hit = _W2V_CACHE.get(path)
    if hit is None:
        z = np.load(path, allow_pickle=False)
        vocab = {str(w): i for i, w in enumerate(z["vocab"])}
        hit = (vocab, np.asarray(z["vectors"], dtype=np.float64))
        _W2V_CACHE[path] = hit
    return hit


def embed_documents_model(docs: DataFrame, text_col: str = "text",
                          id_col: str = "doc_id",
                          model_path: str | None = None) -> DataFrame:
    """G7 with real weights: mean of per-word vectors from an on-disk
    model, matching the reference's in-vocab semantics (db/models.py:
    39-47 — only words present in ``index2word_set`` contribute to the
    mean; a fully-OOV text embeds as the zero vector).

    ``model_path`` (or ``$MEMEX_KG_W2V_NPZ``) points to an npz with
    ``vocab`` (array<str>) and ``vectors`` (float[n, dim]). The file is
    loaded once per Python worker (module cache above) inside a pandas
    UDF — Arrow batches in, one matrix gather + mean per row out. With
    no model configured this falls back to the deterministic md5
    stand-in ``embed_documents``, so environments without weights keep
    byte-identical behavior (the registered/oracle path never depends
    on a file only some deployments have)."""
    import os

    path = model_path or os.environ.get(W2V_NPZ_ENV)
    if not path:
        return embed_documents(docs, text_col, id_col)
    from pyspark.sql.types import ArrayType, DoubleType

    @F.pandas_udf(ArrayType(DoubleType()))
    def emb(texts: pd.Series) -> pd.Series:
        vocab, mat = _load_word_vectors(path)
        dim = mat.shape[1]
        out = []
        for t in texts:
            toks = str(t).lower().split() if t is not None else []
            idx = [vocab[w] for w in toks if w in vocab]
            out.append(np.round(mat[idx].mean(axis=0), 6).tolist()
                       if idx else [0.0] * dim)
        return pd.Series(out)

    return docs.select(id_col, emb(F.col(text_col)).alias("embedding"))
