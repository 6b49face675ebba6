"""Multimodal (image/audio/video) column plumbing.

Opaque media are carried as ``binary`` columns with typed metadata; decode
/ feature-extraction runs as vectorized pandas stages over ``mapInPandas``
(Arrow ships the raw bytes batch-wise to Python, the only sane place for
codec libraries). The actual codecs (PIL/torchaudio/ffmpeg) are NOT in
this container, so the decode step is a clearly-marked deterministic stub
— the Spark-side contract (schema, batching, partition behavior, UDF
signatures) is real and tested.

Reference analogue: image download + ResNet18 embedding
(db/extract_images.py:24-75, db/models.py:59-121).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id long, n_bytes long, checksum string, "
                  "byte_histogram array<double>")


def attach_binary_payload(docs: DataFrame, text_col: str = "text"
                          ) -> DataFrame:
    """Stand-in media payload: the UTF-8 bytes of the text column plus a
    deterministic header. In production this column comes straight from
    the lakehouse (parquet BINARY / Iceberg blob)."""
    return docs.withColumn(
        "payload",
        F.encode(F.concat(F.lit("IMG0"), F.coalesce(F.col(text_col),
                                                    F.lit(""))), "UTF-8"))


MEDIA_CODEC_ENV = "MEMEX_KG_MEDIA_CODEC"
VISUAL_NPZ_ENV = "MEMEX_KG_VISUAL_NPZ"

_VISUAL_CACHE: dict = {}  # per-worker weights cache (broadcast-model
# pattern, same contract as embed_text._W2V_CACHE)


def decode_media(payload: bytes, codec=None) -> "np.ndarray":
    """Decode a media payload to a raw sample array (uint8).

    Real codecs (PIL/torchaudio/ffmpeg) are NOT in this container, so
    decoding is env-gated: ``codec`` (or ``$MEMEX_KG_MEDIA_CODEC``)
    names an importable module exposing ``decode(bytes) -> ndarray`` —
    the seam where PIL.Image.open / torchaudio.load / av.open plugs in.
    With no codec configured this RAISES so callers can't silently
    treat stub features as real."""
    import os
    codec = codec or os.environ.get(MEDIA_CODEC_ENV)
    if codec is not None:
        if callable(codec):
            return codec(payload)
        import importlib
        return importlib.import_module(codec).decode(payload)
    raise NotImplementedError(
        "media codecs (PIL/torchaudio/ffmpeg) are not installed; point "
        f"${MEDIA_CODEC_ENV} at a module exposing decode(bytes)->ndarray "
        "or use extract_features (deterministic stub) for plumbing tests")


def _load_visual(path: str) -> "np.ndarray":
    hit = _VISUAL_CACHE.get(path)
    if hit is None:
        z = np.load(path, allow_pickle=False)
        hit = np.asarray(z["proj"], dtype=np.float64)
        _VISUAL_CACHE[path] = hit
    return hit


def extract_visual_embeddings(with_payload: DataFrame,
                              model_path: str | None = None,
                              codec=None) -> DataFrame:
    """G8 with real weights (reference ResNet18 image embedding,
    db/models.py:59-121 and extract_images.py:24-75): decode each
    payload through the env-pointed codec seam (``decode_media``),
    featurize the decoded sample (16-bin normalized nibble histogram —
    the stand-in backbone), and project through ``proj`` (float[16, d])
    from the npz at ``model_path`` / ``$MEMEX_KG_VISUAL_NPZ``. Weights
    load once per Python worker; decode + matmul run vectorized per
    Arrow batch inside mapInPandas (narrow stage, no shuffle). RAISES
    when either seam is absent — stub features never masquerade as
    real. ``codec`` may be a callable (tests / driver-local decoders)
    or a module name (cluster deployments, importable on executors)."""
    import os

    path = model_path or os.environ.get(VISUAL_NPZ_ENV)
    codec = codec or os.environ.get(MEDIA_CODEC_ENV)
    if not path or codec is None:
        raise NotImplementedError(
            f"visual embedding needs ${VISUAL_NPZ_ENV} (npz with 'proj' "
            f"float[16, d]) and ${MEDIA_CODEC_ENV} (decode seam)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        proj = _load_visual(path)
        for pdf in batches:
            embs = []
            for payload in pdf["payload"]:
                arr = np.asarray(
                    decode_media(bytes(payload), codec=codec)).ravel()
                arr = arr.astype(np.uint8, copy=False)
                h = np.bincount(arr >> 4, minlength=16).astype(np.float64)
                tot = h.sum()
                feat = h / tot if tot > 0 else h
                embs.append(np.round(feat @ proj, 6).tolist())
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "embedding": embs,
            })

    return (with_payload.select("doc_id", "payload")
            .mapInPandas(run, schema="doc_id long, "
                                     "embedding array<double>"))


def _feature_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake 'decode + featurize': byte length, md5 checksum,
    16-bin byte histogram (normalized). Vectorized per Arrow batch; the
    real implementation swaps only the body, never the plumbing."""
    import hashlib

    payloads = pdf["payload"]
    n_bytes = payloads.map(len).astype("int64")
    checksum = payloads.map(lambda b: hashlib.md5(bytes(b)).hexdigest())
    # one histogram pass over the whole batch: concatenate payload bytes,
    # bincount per row via offset-shifted bins (row_idx*16 + nibble) —
    # no per-row numpy calls
    lens = n_bytes.to_numpy()
    if lens.sum():
        allb = np.frombuffer(b"".join(bytes(b) for b in payloads),
                             dtype=np.uint8)
        row_idx = np.repeat(np.arange(len(lens)), lens)
        flat = np.bincount(row_idx * 16 + (allb >> 4),
                           minlength=len(lens) * 16).astype(np.float64)
        h = flat.reshape(len(lens), 16)
        totals = h.sum(axis=1, keepdims=True)
        h = np.divide(h, totals, out=np.zeros_like(h), where=totals > 0)
        hists = [row.round(6).tolist() for row in h]
    else:
        hists = [[0.0] * 16 for _ in lens]
    return pd.DataFrame({
        "doc_id": pdf["doc_id"].astype("int64"),
        "n_bytes": n_bytes,
        "checksum": checksum,
        "byte_histogram": hists,
    })


def extract_features(with_payload: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads (narrow stage,
    no shuffle; Arrow batch size bounds executor memory)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _feature_batch(pdf)

    return (with_payload.select("doc_id", "payload")
            .mapInPandas(run, schema=FEATURE_SCHEMA))
