"""Vector similarity search over embedding columns (array<float>).

Two paths, per the scale doctrine:
- brute-force cosine top-k with pure built-ins (``zip_with`` +
  ``aggregate`` higher-order functions -> whole-stage codegen, no Python);
  correct baseline at any k, O(n) scans that parallelize trivially;
- LSH-bucketed candidate generation (random-hyperplane signatures via a
  vectorized pandas UDF over Arrow batches) for the 100 TB path: the
  bucket equi-join replaces the all-pairs scan, turning O(n^2) into
  per-bucket work, with multi-probe (hamming-adjacent buckets) recall.

The reference's analogues: cosine/euclidean GDS calls in search
(db/db_search.py:72-150) and w2v embedding storage (db/models.py:30-47).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def dot(a: Column, b: Column) -> Column:
    """Element-wise dot product of two array columns, accumulated in
    double (JVM-side fold — deterministic left-to-right order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def euclidean(a: Column, b: Column) -> Column:
    """F9 parity (gds.alpha.similarity.euclideanDistance)."""
    return F.sqrt(F.aggregate(
        F.zip_with(a, b, lambda x, y: F.pow(x.cast("double")
                                            - y.cast("double"), 2)),
        F.lit(0.0), lambda acc, v: acc + v))


def brute_topk(emb: DataFrame, query_vec: list[float], k: int,
               id_col: str = "vec_id", vec_col: str = "embedding"
               ) -> DataFrame:
    """Baseline ANN: exact cosine top-k against a literal query vector.
    Plans as scan -> project (codegen) -> TakeOrderedAndProject; the scan
    parallelizes across partitions, the top-k needs no global sort."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (emb.select(id_col,
                       F.round(cosine(F.col(vec_col), q), 4).alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """md5-derived hyperplane components, uniform in (-0.5, 0.5):
    plane[p][j] = md5("lsh:{seed}:{p}:{j}")[:8] / 2^32 - 0.5.

    Engine-portable like every other hash in the repo — DuckDB reproduces
    the identical planes (and hence buckets and probed candidate sets) in
    plain SQL, which is what upgrades the LSH query from rows-only to the
    full value-hash driver check. Sign-hash LSH only needs symmetrically
    distributed directions, not gaussian components; recall vs brute
    force is pinned in pytest."""
    import hashlib

    def comp(p: int, j: int) -> float:
        h = hashlib.md5(f"lsh:{seed}:{p}:{j}".encode()).hexdigest()[:8]
        return int(h, 16) / 4294967296.0 - 0.5

    return np.array([[comp(p, j) for j in range(dim)]
                     for p in range(n_planes)], dtype=np.float64)


def lsh_signatures(emb: DataFrame, dim: int, n_planes: int = 16,
                   seed: int = 42, vec_col: str = "embedding") -> DataFrame:
    """Random-hyperplane LSH bucket id per row (vectorized pandas UDF:
    one matmul per Arrow batch). Deterministic given (dim, n_planes,
    seed) — any executor computes identical buckets."""
    planes = _hyperplanes(dim, n_planes, seed)

    @F.pandas_udf(LongType())
    def bucket(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())  # (batch, dim)
        signs = (m.astype(np.float64) @ planes.T) > 0  # (batch, planes)
        weights = (1 << np.arange(n_planes, dtype=np.int64))
        return pd.Series(signs.astype(np.int64) @ weights)

    return emb.withColumn("bucket", bucket(F.col(vec_col)))


def lsh_topk(emb: DataFrame, query_vec: list[float], k: int,
             n_planes: int = 12, seed: int = 42, id_col: str = "vec_id",
             vec_col: str = "embedding", probe_bits: int = 1) -> DataFrame:
    """ANN top-k restricted to the query's LSH bucket plus all buckets
    within hamming distance ``probe_bits`` (multi-probe). At scale the
    bucket filter prunes the scan via a partition-prunable equi-filter."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    qsig = int(((np.asarray(query_vec, dtype=np.float64) @ planes.T) > 0)
               .astype(np.int64) @ (1 << np.arange(n_planes, dtype=np.int64)))
    from itertools import combinations
    probes = [qsig]
    for width in range(1, probe_bits + 1):
        probes += [qsig ^ sum(1 << i for i in flip)
                   for flip in combinations(range(n_planes), width)]
    sigs = lsh_signatures(emb, dim, n_planes, seed, vec_col)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (sigs.filter(F.col("bucket").isin(probes))
            .select(id_col,
                    F.round(cosine(F.col(vec_col), q), 4).alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))


def ivf_assign(emb: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: nearest-centroid list id per row, pure
    column expressions (one cosine per centroid, argmax via array_position
    on the similarity array) — whole-stage codegen, no Python. Centroids
    are a small driver-side list; at scale they come from ``ivf_centroids``
    (distributed sampled k-means) and broadcast as literals the same way.

    Guards: a zero-norm row (or zero-norm centroid) scores -1.0 instead
    of NaN, so every row lands in a real list (NaN would make
    array_position return 0 -> list_id -1 -> silently unsearchable)."""
    def safe_cos(c):
        cc = F.array(*[F.lit(float(x)) for x in c])
        d = norm(F.col(vec_col)) * norm(cc)
        # rounded to 6: argmax decisions agree bit-for-bit across engines
        # (summation order differs between Spark's fold and SQL SUM)
        return F.when(d > 0, F.round(dot(F.col(vec_col), cc) / d, 6)
                      ).otherwise(F.lit(-1.0))

    sims = F.array(*[safe_cos(c) for c in centroids])
    return emb.withColumn(
        "list_id",
        (F.array_position(sims, F.array_max(sims)) - 1).cast("int"))


def ivf_centroids(emb: DataFrame, n_lists: int, iterations: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  seed: int = 7) -> list[list[float]]:
    """Deterministic sampled k-means (Lloyd) centroids.

    Init = the ``n_lists`` vectors whose md5(seed:id) sorts smallest — a
    uniform deterministic sample that any engine reproduces (unlike
    first-N-by-id, which inherits whatever ordering bias ids carry). Each
    Lloyd step is fully distributed: assignment is the codegen
    ``ivf_assign`` plan, the update is posexplode -> per-(list, dim) mean
    — the only driver-side data is the k x dim centroid matrix itself.
    Duplicate init vectors are deduped (aliased empty lists otherwise)
    and n_lists clamps to the available row count."""
    init_rows = (emb.select(vec_col)
                 .orderBy(F.md5(F.concat_ws(":", F.lit(str(seed)),
                                            F.col(id_col).cast("string"))),
                          F.col(id_col))
                 .limit(n_lists).collect())
    seen, cents = set(), []
    for r in init_rows:
        key = tuple(float(x) for x in r[0])
        if key not in seen:
            seen.add(key)
            cents.append(list(key))
    for _ in range(iterations):
        assigned = ivf_assign(emb, cents, vec_col)
        means = (assigned
                 .select("list_id", F.posexplode(vec_col)
                         .alias("j", "x"))
                 .groupBy("list_id", "j")
                 .agg(F.avg(F.col("x").cast("double")).alias("m"))
                 .collect())
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            # round(6): centroids agree across engines despite summation-
            # order epsilon in the mean
            by_list.setdefault(r["list_id"], {})[r["j"]] = round(r["m"], 6)
        cents = [
            [by_list[i][j] for j in sorted(by_list[i])]
            if i in by_list else cents[i]  # empty list keeps its centroid
            for i in range(len(cents))]
    return cents


def ivf_topk(emb: DataFrame, query_vec: list[float], k: int,
             n_lists: int = 16, n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding", iterations: int = 2) -> DataFrame:
    """IVF-flat ANN: coarse-quantize rows into ``n_lists`` inverted lists
    (sampled-k-means centroids), search only the ``n_probe`` lists whose
    centroids are closest to the query. At 100 TB the table is written
    partitioned by list_id, so probing prunes partitions."""
    cents = ivf_centroids(emb, n_lists, iterations, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    cm = np.stack([np.asarray(c, dtype=np.float64) for c in cents])
    cn = np.linalg.norm(cm, axis=1) * np.linalg.norm(q)
    sims = np.where(cn > 0, (cm @ q) / np.where(cn > 0, cn, 1.0), -1.0)
    sims = np.round(sims, 6)  # cross-engine probe-choice stability
    probe_ids = [int(i) for i in np.argsort(-sims, kind="stable")[:n_probe]]
    assigned = ivf_assign(emb, cents, vec_col)
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (assigned.filter(F.col("list_id").isin(probe_ids))
            .select(id_col,
                    F.round(cosine(F.col(vec_col), qcol), 4).alias("sim"))
            .orderBy(F.col("sim").desc(), F.col(id_col).asc())
            .limit(k))


EMBED_LSH_MAX_BUCKET = 64  # per-(band, key) candidate cap: bounds any
# LSH bucket's self-join at max_bucket^2 pairs. Without it a tight
# embedding cluster (near-identical directions hash to one bucket) makes
# a single bucket quadratic at corpus scale — the exact failure mode
# JACCARD_MAX_DF fixes for hot shingles (r3 verdict #5).


def embedding_near_dup_pairs(emb: DataFrame, threshold: float = 0.99,
                             n_bands: int = 2, band_planes: int = 8,
                             seed: int = 42,
                             max_bucket: int = EMBED_LSH_MAX_BUCKET,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicate pairs, the bounded scale path.

    Banded sign-LSH (MinHash-banding structure applied to hyperplane
    signatures): each row gets ``n_bands`` bucket keys of ``band_planes``
    sign bits each; a pair becomes a candidate if it shares ANY band's
    bucket. Buckets larger than ``max_bucket`` are dropped per band
    (hot-bucket anti-join) — banding keeps recall under the cap, since a
    cluster hot in one band's keyspace can still pair through another
    band, while work stays bounded at max_bucket^2 pairs per bucket.
    Candidates are verified with exact cosine (join vectors back, two
    key-partitioned joins — no vector ever fans out per band).

    Everything is md5-derived (``_hyperplanes``), so a SQL engine
    replays the identical buckets, caps, and candidate set — the DuckDB
    oracle twin is SQL_DEDUP_EMBEDDING."""
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    sigs = lsh_signatures(emb, dim_row["d"], n_bands * band_planes, seed,
                          vec_col)
    mask = (1 << band_planes) - 1
    keys = sigs.select(
        id_col,
        F.posexplode(F.array(*[
            F.shiftright(F.col("bucket"), b * band_planes)
            .bitwiseAND(F.lit(mask))
            for b in range(n_bands)])).alias("band", "key"))
    hot = (keys.groupBy("band", "key").count()
           .filter(F.col("count") > max_bucket).drop("count"))
    cold = keys.join(hot, ["band", "key"], "left_anti")
    a = cold.select(F.col(id_col).alias("a_id"), "band", "key")
    b = cold.select(F.col(id_col).alias("b_id"), "band", "key")
    cands = (a.join(b, ["band", "key"])
             .filter(F.col("a_id") < F.col("b_id"))
             .select("a_id", "b_id").distinct())
    av = emb.select(F.col(id_col).alias("a_id"),
                    F.col(vec_col).alias("a_vec"))
    bv = emb.select(F.col(id_col).alias("b_id"),
                    F.col(vec_col).alias("b_vec"))
    return (cands.join(av, "a_id").join(bv, "b_id")
            .withColumn("sim", F.round(cosine(F.col("a_vec"),
                                              F.col("b_vec")), 4))
            .filter(F.col("sim") >= threshold)
            .select("a_id", "b_id", "sim"))


def pairwise_topk_per_item(emb: DataFrame, k: int, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           n_planes: int = 8, seed: int = 42,
                           max_bucket: int = EMBED_LSH_MAX_BUCKET
                           ) -> DataFrame:
    """All-pairs k-NN via LSH bucket self-join (the scale path for
    embedding-cosine near-dup): pairs only form inside a bucket.

    Buckets larger than ``max_bucket`` are dropped (the same hot-bucket
    anti-join that bounds ``embedding_near_dup_pairs``): a tight
    embedding cluster hashing to one bucket would otherwise make that
    bucket's self-join quadratic at corpus scale. Work is bounded at
    max_bucket^2 pairs per bucket; neighbors are only ever sought among
    same-bucket candidates, so the cap trades recall inside pathological
    hot buckets for a hard upper bound on join fan-out."""
    dim_row = emb.select(F.size(vec_col).alias("d")).first()
    sigs = lsh_signatures(emb, dim_row["d"], n_planes, seed, vec_col)
    hot = (sigs.groupBy("bucket").count()
           .filter(F.col("count") > max_bucket).drop("count"))
    cold = sigs.join(hot, ["bucket"], "left_anti")
    a = cold.select(F.col(id_col).alias("a_id"),
                    F.col(vec_col).alias("a_vec"), "bucket")
    b = cold.select(F.col(id_col).alias("b_id"),
                    F.col(vec_col).alias("b_vec"), "bucket")
    pairs = (a.join(b, "bucket")
             .filter(F.col("a_id") != F.col("b_id"))
             .withColumn("sim", F.round(cosine(F.col("a_vec"),
                                               F.col("b_vec")), 4)))
    from pyspark.sql import Window
    w = Window.partitionBy("a_id").orderBy(F.col("sim").desc(),
                                           F.col("b_id").asc())
    return (pairs.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("a_id", "b_id", "sim", "rk"))
