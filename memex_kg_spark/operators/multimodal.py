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


def decode_media(payload: bytes) -> "np.ndarray":
    """REAL DECODER NOT AVAILABLE IN THIS ENVIRONMENT.

    Would be: PIL.Image.open(io.BytesIO(payload)) / torchaudio.load /
    av.open for video frame sampling. Raise so callers can't silently
    treat stub features as real."""
    raise NotImplementedError(
        "media codecs (PIL/torchaudio/ffmpeg) are not installed; "
        "use extract_features (deterministic stub) for plumbing tests")


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
