"""Unit tests for the dedup / similarity operator suites."""

from __future__ import annotations

from pyspark.sql import functions as F

from memex_kg_spark.operators import dedup as D
from memex_kg_spark.operators import similarity as S

SF01 = "/root/testdata/sf0.01"


def test_lsh_topk_recall(spark):
    """Multi-probe LSH must recover planted near-duplicates (cos ~0.99).

    The raw testdata embeddings are near-random (best cosine ~0.37 — not
    'near' in the LSH sense: P(bucket collision) ~ (1 - theta/pi)^bits is
    negligible at theta ~68 deg), so near-dups are planted: vec 0 plus
    small deterministic noise."""
    import numpy as np
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    q = np.array(emb.filter(F.col("vec_id") == 0).first()["embedding"],
                 dtype=np.float64)
    rng = np.random.RandomState(7)
    planted = [(10000 + i,
                (q + 0.02 * rng.standard_normal(len(q))).tolist(), -1)
               for i in range(10)]
    aug = emb.unionByName(spark.createDataFrame(
        planted, ["vec_id", "embedding", "label"]))
    exact = {r["vec_id"] for r in S.brute_topk(
        aug.filter("vec_id != 0"), list(q), 10).collect()}
    assert exact == {10000 + i for i in range(10)}  # planted dominate
    approx = {r["vec_id"] for r in S.lsh_topk(
        aug.filter("vec_id != 0"), list(q), 10, n_planes=12,
        probe_bits=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"LSH recall too low: {recall}"


def test_lsh_signatures_deterministic(spark):
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    a = S.lsh_signatures(emb, 64).select("vec_id", "bucket").toPandas()
    b = S.lsh_signatures(emb.repartition(7), 64).select(
        "vec_id", "bucket").toPandas()
    assert (a.sort_values("vec_id").reset_index(drop=True)
            .equals(b.sort_values("vec_id").reset_index(drop=True)))


def test_minhash_lsh_candidates_superset_of_high_jaccard(spark):
    """Banding must recover every pair the exact Jaccard op scores >= 0.5
    (b=4, r=4: P(miss | J=0.5) = (1 - 0.5^4)^4 ~ 0.77 per band scheme, so
    use docs-with-dups where true dups have J=1.0 -> P(miss) = 0)."""
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text")
    dup = docs.unionByName(docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"))
    lsh = D.minhash_lsh_pairs(dup, n_hashes=16, band_size=4, threshold=0.99)
    got = {(r["a_id"], r["b_id"]) for r in lsh.collect()}
    want = {(i, i + 100000) for i in
            [r["doc_id"] for r in docs.select("doc_id").collect()]}
    assert want <= got


def test_exact_duplicates_finds_planted(spark):
    docs = spark.read.parquet(f"{SF01}/documents.parquet").select(
        "doc_id", "text").limit(20)
    dup = docs.unionByName(docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"))
    out = D.exact_duplicates(dup).toPandas()
    assert len(out) == 40  # every planted pair flagged, both members
    assert (out["canonical_id"] == out["doc_id"] % 100000).all()


def test_simhash_identical_docs_zero_hamming(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "completely different words entirely unrelated")],
        ["doc_id", "text"])
    pairs = D.simhash_pairs(docs, max_hamming=0).collect()
    assert {(r["a_id"], r["b_id"]) for r in pairs} == {(1, 2)}


def test_multimodal_stub(spark):
    """Binary-column plumbing: schema, batching, deterministic features."""
    from memex_kg_spark.operators.multimodal import (
        attach_binary_payload, extract_features)
    docs = spark.read.parquet(f"{SF01}/documents.parquet").limit(50)
    with_bin = attach_binary_payload(docs)
    assert dict(with_bin.dtypes)["payload"] == "binary"
    feats = extract_features(with_bin).toPandas()
    assert len(feats) == 50
    assert set(feats.columns) == {"doc_id", "n_bytes", "checksum",
                                  "byte_histogram"}
    assert (feats["n_bytes"] > 0).all()
    assert feats["byte_histogram"].map(len).eq(16).all()


def test_ivf_topk_recall(spark):
    """IVF probing must recover planted near-duplicates (same planting
    scheme as the LSH test): with the query's own list among the probed
    lists, cos~0.99 neighbors quantize to the same or a probed list."""
    import numpy as np
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    q = np.array(emb.filter(F.col("vec_id") == 0).first()["embedding"],
                 dtype=np.float64)
    rng = np.random.RandomState(7)
    planted = [(10000 + i,
                (q + 0.02 * rng.standard_normal(len(q))).tolist(), -1)
               for i in range(10)]
    aug = emb.unionByName(spark.createDataFrame(
        planted, ["vec_id", "embedding", "label"]))
    exact = {r["vec_id"] for r in S.brute_topk(
        aug.filter("vec_id != 0"), list(q), 10).collect()}
    approx = {r["vec_id"] for r in S.ivf_topk(
        aug.filter("vec_id != 0"), list(q), 10, n_lists=16,
        n_probe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7, f"IVF recall too low: {recall}"


def test_ivf_assign_deterministic_and_total(spark):
    """Every row gets exactly one list id in [0, n_lists), independent of
    partitioning (argmax over column exprs is deterministic)."""
    emb = spark.read.parquet(f"{SF01}/embeddings.parquet")
    cents = [list(r[0]) for r in
             emb.orderBy("vec_id").limit(8).select("embedding").collect()]
    a = S.ivf_assign(emb, cents).select("vec_id", "list_id").toPandas()
    b = S.ivf_assign(emb.repartition(5), cents).select(
        "vec_id", "list_id").toPandas()
    assert a["list_id"].between(0, 7).all()
    assert (a.sort_values("vec_id").reset_index(drop=True)
            .equals(b.sort_values("vec_id").reset_index(drop=True)))


def test_dedup_embedding_finds_scaled_copies(spark):
    """Cosine near-dup query: every probe's scaled copy (2x magnitude)
    must appear as a sim=1.0 pair — cosine is scale-invariant."""
    from memex_kg_spark.queries.vector import q_dedup_embedding
    out = q_dedup_embedding(spark, SF01).collect()
    probe_ids = {r["a_id"] for r in out}
    pairs = {(r["a_id"], r["b_id"]): r["sim"] for r in out}
    n_probes = spark.read.parquet(f"{SF01}/embeddings.parquet").filter(
        "vec_id < 100").count()
    for a in probe_ids:
        assert pairs.get((a, a + 100000)) == 1.0
    assert len(probe_ids) == n_probes


def test_embedding_lsh_bucket_cap(spark):
    """r4 (verdict #5): the per-(band, bucket) df cap bounds the LSH
    self-join. A tight cluster (identical directions -> identical sign
    signature in EVERY band) larger than the cap is dropped from every
    band — zero candidate pairs, bounded work — while under the cap all
    of its pairs are found. Same contract as JACCARD_MAX_DF for hot
    shingles."""
    v = [0.9, -0.3, 0.5, 0.1, -0.7, 0.2, -0.4, 0.8]
    rows = [(i, [x * (1.0 + i) for x in v]) for i in range(30)]
    # deterministic LCG background: unrelated directions, no near-dups
    s = 12345
    for i in range(100, 130):
        vec = []
        for _ in range(8):
            s = (s * 1103515245 + 12345) % (1 << 31)
            vec.append(s / float(1 << 30) - 1.0)
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = S.embedding_near_dup_pairs(
        df, threshold=0.999, n_bands=2, band_planes=8, max_bucket=5)
    assert not [r for r in capped.collect() if r["a_id"] < 30]

    uncapped = S.embedding_near_dup_pairs(
        df, threshold=0.999, n_bands=2, band_planes=8, max_bucket=64)
    got = {(r["a_id"], r["b_id"]) for r in uncapped.collect()
           if r["a_id"] < 30 and r["b_id"] < 30}
    want = {(a, b) for a in range(30) for b in range(30) if a < b}
    assert got == want

    # plan shape: hot-bucket anti-join present, never a cartesian product
    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan


def test_pairwise_topk_per_item_capped(spark):
    """r5 (verdict #2): pairwise_topk_per_item gets the same hot-bucket
    cap as embedding_near_dup_pairs. A tight cluster over the cap is
    dropped (bounded work); under the cap every item reports both
    directions of each neighbor pair (per-item lists, a!=b not a<b)."""
    v = [0.9, -0.3, 0.5, 0.1, -0.7, 0.2, -0.4, 0.8]
    rows = [(i, [x * (1.0 + i) for x in v]) for i in range(30)]
    s = 54321
    for i in range(100, 120):
        vec = []
        for _ in range(8):
            s = (s * 1103515245 + 12345) % (1 << 31)
            vec.append(s / float(1 << 30) - 1.0)
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    capped = S.pairwise_topk_per_item(df, k=3, max_bucket=5)
    assert not [r for r in capped.collect() if r["a_id"] < 30]

    open_ = S.pairwise_topk_per_item(df, k=40, max_bucket=64).collect()
    per_item = {}
    for r in open_:
        per_item.setdefault(r["a_id"], set()).add(r["b_id"])
    # the scaled-copy cluster shares one sign signature: every member
    # sees every other member (both directions), sims all 1.0
    for a in range(30):
        assert per_item[a] >= {b for b in range(30) if b != a}
    assert all(r["sim"] == 1.0 for r in open_
               if r["a_id"] < 30 and r["b_id"] < 30)

    plan = capped._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
