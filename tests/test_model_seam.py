"""r4: optional real-model seam for G7/G8 (r3 verdict "missing #1").

The reference embeds with GoogleNews-300 word2vec (db/models.py:20-47)
and ResNet18 (db/models.py:59-121). The sandbox has neither, so the
engine's embedding stages expose an env/argument-pointed weights seam:
a tiny on-disk npz "model" proves the seam end-to-end, and with no
model configured behavior is byte-identical to the deterministic
stand-ins.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pytest

from memex_kg_spark.operators import multimodal as MM
from memex_kg_spark.operators.embed_text import (
    W2V_NPZ_ENV, embed_documents, embed_documents_model)


@pytest.fixture(scope="module")
def w2v_npz():
    d = tempfile.mkdtemp(prefix="w2v-")
    path = os.path.join(d, "model.npz")
    np.savez(path,
             vocab=np.array(["alpha", "beta", "gamma"]),
             vectors=np.array([[1.0, 2.0], [3.0, 5.0], [-1.0, 0.5]]))
    return path


def test_w2v_seam_means_in_vocab_words(spark, w2v_npz):
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "ALPHA"), (2, "unknown words"),
         (3, None), (4, "alpha zzz gamma")],
        ["doc_id", "text"])
    out = {r["doc_id"]: r["embedding"]
           for r in embed_documents_model(
               docs, model_path=w2v_npz).collect()}
    assert out[0] == [2.0, 3.5]          # mean of alpha, beta
    assert out[1] == [1.0, 2.0]          # case-normalized vocab hit
    assert out[2] == [0.0, 0.0]          # fully OOV -> zero vector
    assert out[3] == [0.0, 0.0]          # null text -> zero vector
    assert out[4] == [0.0, 1.25]         # OOV words skipped, not zeroed
    # (reference in-vocab mean semantics, db/models.py:39-47)


def test_w2v_seam_env_pointer(spark, w2v_npz, monkeypatch):
    monkeypatch.setenv(W2V_NPZ_ENV, w2v_npz)
    docs = spark.createDataFrame([(0, "beta")], ["doc_id", "text"])
    out = embed_documents_model(docs).collect()
    assert out[0]["embedding"] == [3.0, 5.0]


def test_w2v_seam_fallback_is_standin(spark, monkeypatch):
    monkeypatch.delenv(W2V_NPZ_ENV, raising=False)
    docs = spark.createDataFrame(
        [(0, "some words here"), (1, "other text")], ["doc_id", "text"])
    a = {r["doc_id"]: r["embedding"]
         for r in embed_documents_model(docs).collect()}
    b = {r["doc_id"]: r["embedding"]
         for r in embed_documents(docs).collect()}
    assert a == b


def test_visual_seam_decodes_and_projects(spark):
    d = tempfile.mkdtemp(prefix="vis-")
    path = os.path.join(d, "vis.npz")
    proj = np.arange(48, dtype=np.float64).reshape(16, 3) / 10.0
    np.savez(path, proj=proj)

    def fake_codec(payload: bytes) -> np.ndarray:
        return np.frombuffer(payload, dtype=np.uint8)

    docs = spark.createDataFrame([(0, "hello"), (1, "")],
                                 ["doc_id", "text"])
    out = MM.extract_visual_embeddings(
        MM.attach_binary_payload(docs), model_path=path, codec=fake_codec)
    got = {r["doc_id"]: r["embedding"] for r in out.collect()}

    def expect(text: str):
        arr = np.frombuffer(("IMG0" + text).encode(), dtype=np.uint8)
        h = np.bincount(arr >> 4, minlength=16).astype(np.float64)
        tot = h.sum()
        feat = h / tot if tot > 0 else h
        return np.round(feat @ proj, 6).tolist()

    assert got[0] == expect("hello")
    assert got[1] == expect("")
    assert len(got[0]) == 3


def test_visual_seam_absent_raises(spark, monkeypatch):
    monkeypatch.delenv(MM.VISUAL_NPZ_ENV, raising=False)
    monkeypatch.delenv(MM.MEDIA_CODEC_ENV, raising=False)
    docs = spark.createDataFrame([(0, "x")], ["doc_id", "text"])
    with pytest.raises(NotImplementedError):
        MM.extract_visual_embeddings(MM.attach_binary_payload(docs))
    with pytest.raises(NotImplementedError):
        MM.decode_media(b"bytes")
