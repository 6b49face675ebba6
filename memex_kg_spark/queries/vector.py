"""Vector-similarity + deduplication queries with DuckDB oracle twins.

Engine-portable hashing everywhere (md5-derived), integer or rounded
outputs, deterministic tie-breaks — so the value-hash comparison is exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from ..operators import similarity as S


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_with_dups(spark, sf_dir):
    """documents + a shifted-id copy: guarantees exact-dup groups so the
    dedup path is exercised (the raw corpus may have no exact dups)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    return d.unionByName(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))


_DOCS_DUP_SQL = """
docs2 AS (SELECT doc_id, text FROM documents
          UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents)
"""

_SHINGLE_SQL = """
toks AS (SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
         FROM documents),
sh AS (SELECT DISTINCT doc_id,
              array_to_string(t[i + 1:i + 3], ' ') AS shingle
       FROM (SELECT doc_id, t,
                    unnest(range(0, greatest(len(t) - 3, 0) + 1)) AS i
             FROM toks)
       WHERE array_to_string(t[i + 1:i + 3], ' ') <> ''),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
inter AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
          FROM sh a JOIN sh b USING (shingle)
          WHERE a.doc_id < b.doc_id GROUP BY a_id, b_id),
jac AS (SELECT i.a_id, i.b_id,
               round(i.inter / (sa.n_sh + sb.n_sh - i.inter), 6) AS jaccard
        FROM inter i
        JOIN sizes sa ON i.a_id = sa.doc_id
        JOIN sizes sb ON i.b_id = sb.doc_id)
"""


# --- queries -----------------------------------------------------------------


def q_ann_brute_topk(spark, sf_dir):
    """Exact embedding-metric family in one row (merged r3 for the
    driver's 50-row budget):

    - ``part='cos'``: exact cosine top-10 neighbors of vec_id=0 (the
      brute-force ANN baseline; T2 analogue of the reference's
      radius+cosine search);
    - ``part='euc'``: euclidean top-10 (T4/F9 — reference
      gds.alpha.similarity.euclideanDistance, db/db_search.py:99-150);
    - ``part='norm'``: per-label vector-norm audit (array higher-order
      functions; the 'is the embedding column healthy' query)."""
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    rest = emb.filter(F.col("vec_id") != 0)
    nul_s = F.lit(None).cast("string")
    nul_l = F.lit(None).cast("long")
    cos = (S.brute_topk(rest, list(qvec), 10)
           .select(F.lit("cos").alias("part"),
                   F.col("vec_id").cast("long").alias("vec_id"),
                   nul_s.alias("label"),
                   F.col("sim").alias("score"),
                   nul_l.alias("n")))
    euc = (rest.select("vec_id",
                       F.round(S.euclidean(F.col("embedding"), q), 4)
                       .alias("dist"))
           .orderBy(F.col("dist").asc(), F.col("vec_id").asc())
           .limit(10)
           .select(F.lit("euc").alias("part"),
                   F.col("vec_id").cast("long").alias("vec_id"),
                   nul_s.alias("label"),
                   F.col("dist").alias("score"),
                   nul_l.alias("n")))
    nrm = (emb.select("label", S.norm(F.col("embedding")).alias("nrm"))
           .groupBy("label")
           .agg(F.count("*").alias("n"),
                F.round(F.avg("nrm"), 4).alias("avg_norm"))
           .select(F.lit("norm").alias("part"),
                   nul_l.alias("vec_id"),
                   F.col("label").cast("string").alias("label"),
                   F.col("avg_norm").alias("score"),
                   F.col("n").cast("long").alias("n")))
    return (cos.unionByName(euc).unionByName(nrm)
            .orderBy("part", "vec_id", "label"))


SQL_ANN_BRUTE = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
pairs AS (SELECT e.vec_id,
                 CAST(unnest(e.embedding) AS DOUBLE) AS x,
                 CAST(unnest(q.qv) AS DOUBLE) AS y
          FROM embeddings e, q WHERE e.vec_id <> 0),
sums AS (SELECT vec_id, sum(x * y) AS d, sum(x * x) AS nx, sum(y * y) AS ny,
                sum((x - y) * (x - y)) AS ss
         FROM pairs GROUP BY vec_id),
cos AS (SELECT vec_id, round(d / (sqrt(nx) * sqrt(ny)), 4) AS sim
        FROM sums ORDER BY sim DESC, vec_id ASC LIMIT 10),
euc AS (SELECT vec_id, round(sqrt(ss), 4) AS dist
        FROM sums ORDER BY dist ASC, vec_id ASC LIMIT 10),
comps AS (SELECT label, vec_id, CAST(unnest(embedding) AS DOUBLE) AS v
          FROM embeddings),
norms AS (SELECT label, vec_id, sqrt(sum(v * v)) AS nrm
          FROM comps GROUP BY label, vec_id),
nstat AS (SELECT label, count(*) AS n, round(avg(nrm), 4) AS avg_norm
          FROM norms GROUP BY label)
SELECT * FROM (
    SELECT 'cos' AS part, CAST(vec_id AS BIGINT) AS vec_id,
           CAST(NULL AS VARCHAR) AS label, sim AS score,
           CAST(NULL AS BIGINT) AS n
    FROM cos
    UNION ALL
    SELECT 'euc' AS part, CAST(vec_id AS BIGINT) AS vec_id,
           CAST(NULL AS VARCHAR) AS label, dist AS score,
           CAST(NULL AS BIGINT) AS n
    FROM euc
    UNION ALL
    SELECT 'norm' AS part, CAST(NULL AS BIGINT) AS vec_id,
           CAST(label AS VARCHAR) AS label,
           avg_norm AS score, CAST(n AS BIGINT) AS n
    FROM nstat)
ORDER BY part, vec_id, label
"""


def q_ann_lsh_topk(spark, sf_dir):
    """LSH-bucketed ANN (multi-probe): the scale path. Hyperplanes are
    md5-derived (operators/similarity._hyperplanes), so the bucket set —
    and hence the probed candidate list — is reproduced exactly by the
    DuckDB oracle (SQL_ANN_LSH); recall-vs-brute-force is additionally
    asserted in pytest."""
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return S.lsh_topk(emb.filter(F.col("vec_id") != 0), list(qvec), 10,
                      n_planes=8, probe_bits=2)


def q_ann_ivf_topk(spark, sf_dir):
    """IVF-bucketed ANN (coarse quantize -> probe nearest lists): the
    partition-prunable scale path. Centroids = deterministic sampled
    k-means (md5-sampled init, 2 Lloyd steps), so the full clustering +
    probing + top-k is replayed by the DuckDB oracle (SQL_ANN_IVF);
    recall vs brute force additionally asserted in pytest."""
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    return S.ivf_topk(emb.filter(F.col("vec_id") != 0), list(qvec), 10,
                      n_lists=16, n_probe=4)


SQL_ANN_LSH = """
WITH vecs AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
                     CAST(unnest(embedding) AS DOUBLE) AS x
              FROM embeddings),
planes AS (SELECT p, j,
                  CAST(('0x' || substr(md5('lsh:42:' || p || ':' || j),
                                       1, 8)) AS BIGINT)
                      / 4294967296.0 - 0.5 AS w
           FROM (SELECT unnest(range(0, 8)) AS p),
                (SELECT unnest(range(0, 64)) AS j)),
dots AS (SELECT v.vec_id, pl.p, sum(v.x * pl.w) AS d
         FROM vecs v JOIN planes pl USING (j)
         GROUP BY v.vec_id, pl.p),
sig AS (SELECT vec_id,
               CAST(sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << p)
                        ELSE 0 END) AS BIGINT) AS bucket
        FROM dots GROUP BY vec_id),
qb AS (SELECT bucket AS q FROM sig WHERE vec_id = 0),
cand AS (SELECT s.vec_id FROM sig s, qb
         WHERE s.vec_id <> 0 AND bit_count(xor(s.bucket, qb.q)) <= 2),
qv AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0),
pairs AS (SELECT e.vec_id, CAST(unnest(e.embedding) AS DOUBLE) AS x,
                 CAST(unnest(qv.qvec) AS DOUBLE) AS y
          FROM embeddings e JOIN cand USING (vec_id), qv),
sums AS (SELECT vec_id, sum(x * y) AS d, sum(x * x) AS nx,
                sum(y * y) AS ny
         FROM pairs GROUP BY vec_id)
SELECT vec_id, round(d / (sqrt(nx) * sqrt(ny)), 4) AS sim
FROM sums ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


def q_semantic_geo_topk(spark, sf_dir):
    """T2/EP3 headline: the COMPOSED geo-gated semantic search — radius
    filter + cosine similarity, ORDER BY similarity DESC, dist ASC
    (reference get_within_radius_w2v, db/db_search.py:72-97, invoked from
    get_top_similar_closest :214-237). The reference fetches EVERY
    in-radius row to the client and slices ``results[:n]`` in Python
    (:237 — the missing-LIMIT bug); here the LIMIT is part of the plan
    and collapses to TakeOrderedAndProject (pinned in test_plans.py)."""
    from ..functions.geo import haversine_km
    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    g = emb.filter(F.col("vec_id") != 0).select(
        "vec_id", "embedding",
        ((F.col("vec_id") * 37 % 18000) / 100.0 - 90.0).alias("lat"),
        ((F.col("vec_id") * 73 % 36000) / 100.0 - 180.0).alias("lon"))
    d = haversine_km(F.lit(41.9), F.lit(12.5), F.col("lat"), F.col("lon"))
    return (g.withColumn("dist_km", F.round(d, 4))
            .filter(F.col("dist_km") < 6000.0)
            .select("vec_id",
                    F.round(S.cosine(F.col("embedding"), q), 4)
                    .alias("sim"),
                    "dist_km")
            .orderBy(F.col("sim").desc(), F.col("dist_km").asc(),
                     F.col("vec_id").asc())
            .limit(10))


SQL_SEMANTIC_GEO = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
geo AS (SELECT vec_id, embedding,
               (vec_id * 37 % 18000) / 100.0 - 90.0 AS lat,
               (vec_id * 73 % 36000) / 100.0 - 180.0 AS lon
        FROM embeddings WHERE vec_id <> 0),
gated AS (SELECT vec_id, embedding,
                 round(2 * 6371.0088 * asin(sqrt(
                     sin(radians(lat - 41.9) / 2) ^ 2 +
                     cos(radians(41.9)) * cos(radians(lat)) *
                     sin(radians(lon - 12.5) / 2) ^ 2)), 4) AS dist_km
          FROM geo),
pairs AS (SELECT g.vec_id, g.dist_km,
                 CAST(unnest(g.embedding) AS DOUBLE) AS x,
                 CAST(unnest(q.qv) AS DOUBLE) AS y
          FROM gated g, q WHERE g.dist_km < 6000.0),
sums AS (SELECT vec_id, dist_km, sum(x * y) AS d, sum(x * x) AS nx,
                sum(y * y) AS ny
         FROM pairs GROUP BY vec_id, dist_km)
SELECT vec_id, round(d / (sqrt(nx) * sqrt(ny)), 4) AS sim, dist_km
FROM sums ORDER BY sim DESC, dist_km ASC, vec_id ASC LIMIT 10
"""


def q_knn_label_vote(spark, sf_dir):
    """Exact top-5 neighbor label vote for the first 20 vectors (the
    embedding-cosine near-dup / classification shape). All-pairs cosine
    restricted to a 20-row probe side -> broadcast-able."""
    emb = _emb(spark, sf_dir)
    probes = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("a_id"), F.col("embedding").alias("a_vec"))
    cands = emb.select(F.col("vec_id").alias("b_id"),
                       F.col("embedding").alias("b_vec"), "label")
    pairs = (F.broadcast(probes).crossJoin(cands)
             .filter(F.col("a_id") != F.col("b_id"))
             .withColumn("sim", F.round(S.cosine(F.col("a_vec"),
                                                 F.col("b_vec")), 4)))
    from pyspark.sql import Window
    w = Window.partitionBy("a_id").orderBy(F.col("sim").desc(),
                                           F.col("b_id").asc())
    top = pairs.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= 5)
    return (top.groupBy("a_id", "label")
            .agg(F.count("*").alias("votes"))
            .orderBy("a_id", F.col("votes").desc(), "label"))


SQL_KNN_VOTE = """
WITH pairs AS (
    SELECT a.vec_id AS a_id, b.vec_id AS b_id, b.label,
           CAST(unnest(a.embedding) AS DOUBLE) AS x,
           CAST(unnest(b.embedding) AS DOUBLE) AS y
    FROM embeddings a, embeddings b
    WHERE a.vec_id < 20 AND a.vec_id <> b.vec_id),
sums AS (SELECT a_id, b_id, any_value(label) AS label,
                sum(x * y) AS d, sum(x * x) AS nx, sum(y * y) AS ny
         FROM pairs GROUP BY a_id, b_id),
ranked AS (SELECT a_id, b_id, label,
                  round(d / (sqrt(nx) * sqrt(ny)), 4) AS sim,
                  row_number() OVER (PARTITION BY a_id
                      ORDER BY round(d / (sqrt(nx) * sqrt(ny)), 4) DESC,
                               b_id ASC) AS rk
           FROM sums)
SELECT a_id, label, count(*) AS votes FROM ranked WHERE rk <= 5
GROUP BY a_id, label ORDER BY a_id, votes DESC, label
"""


SQL_ANN_IVF = """
WITH base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
vecs AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
                CAST(unnest(embedding) AS DOUBLE) AS x
         FROM base),
init AS (SELECT list_id, vec_id FROM (
             SELECT vec_id, row_number() OVER (
                 ORDER BY md5('7:' || CAST(vec_id AS VARCHAR)), vec_id)
                 - 1 AS list_id
             FROM base) WHERE list_id < 16),
c0 AS MATERIALIZED (SELECT i.list_id, v.j, v.x AS w
                    FROM init i JOIN vecs v USING (vec_id)),
d1 AS (SELECT v.vec_id, c.list_id, sum(v.x * c.w) AS dot,
              sqrt(sum(v.x * v.x)) AS nv, sqrt(sum(c.w * c.w)) AS nc
       FROM vecs v JOIN c0 c USING (j) GROUP BY v.vec_id, c.list_id),
a1 AS MATERIALIZED (SELECT vec_id, list_id FROM (
          SELECT vec_id, list_id, row_number() OVER (PARTITION BY vec_id
              ORDER BY CASE WHEN nv * nc > 0
                            THEN round(dot / (nv * nc), 6)
                            ELSE -1.0 END DESC, list_id ASC) AS rk
          FROM d1) WHERE rk = 1),
m1 AS (SELECT a.list_id, v.j, round(avg(v.x), 6) AS m
       FROM a1 a JOIN vecs v USING (vec_id) GROUP BY a.list_id, v.j),
c1 AS MATERIALIZED (SELECT c0.list_id, c0.j, coalesce(m1.m, c0.w) AS w
                    FROM c0 LEFT JOIN m1 USING (list_id, j)),
d2 AS (SELECT v.vec_id, c.list_id, sum(v.x * c.w) AS dot,
              sqrt(sum(v.x * v.x)) AS nv, sqrt(sum(c.w * c.w)) AS nc
       FROM vecs v JOIN c1 c USING (j) GROUP BY v.vec_id, c.list_id),
a2 AS MATERIALIZED (SELECT vec_id, list_id FROM (
          SELECT vec_id, list_id, row_number() OVER (PARTITION BY vec_id
              ORDER BY CASE WHEN nv * nc > 0
                            THEN round(dot / (nv * nc), 6)
                            ELSE -1.0 END DESC, list_id ASC) AS rk
          FROM d2) WHERE rk = 1),
m2 AS (SELECT a.list_id, v.j, round(avg(v.x), 6) AS m
       FROM a2 a JOIN vecs v USING (vec_id) GROUP BY a.list_id, v.j),
c2 AS MATERIALIZED (SELECT c1.list_id, c1.j, coalesce(m2.m, c1.w) AS w
                    FROM c1 LEFT JOIN m2 USING (list_id, j)),
d3 AS (SELECT v.vec_id, c.list_id, sum(v.x * c.w) AS dot,
              sqrt(sum(v.x * v.x)) AS nv, sqrt(sum(c.w * c.w)) AS nc
       FROM vecs v JOIN c2 c USING (j) GROUP BY v.vec_id, c.list_id),
a3 AS (SELECT vec_id, list_id FROM (
          SELECT vec_id, list_id, row_number() OVER (PARTITION BY vec_id
              ORDER BY CASE WHEN nv * nc > 0
                            THEN round(dot / (nv * nc), 6)
                            ELSE -1.0 END DESC, list_id ASC) AS rk
          FROM d3) WHERE rk = 1),
qv AS MATERIALIZED (SELECT generate_subscripts(embedding, 1) - 1 AS j,
                           CAST(unnest(embedding) AS DOUBLE) AS y
                    FROM embeddings WHERE vec_id = 0),
pq AS (SELECT c.list_id, sum(q.y * c.w) AS dot,
              sqrt(sum(q.y * q.y)) AS nq, sqrt(sum(c.w * c.w)) AS nc
       FROM qv q JOIN c2 c USING (j) GROUP BY c.list_id),
probes AS (SELECT list_id FROM (
               SELECT list_id, row_number() OVER (
                   ORDER BY CASE WHEN nq * nc > 0
                                 THEN round(dot / (nq * nc), 6)
                                 ELSE -1.0 END DESC, list_id ASC) AS rk
               FROM pq) WHERE rk <= 4),
cand AS (SELECT a3.vec_id FROM a3 JOIN probes USING (list_id)),
fp AS (SELECT v.vec_id, sum(v.x * q.y) AS d, sqrt(sum(v.x * v.x)) AS nx,
              sqrt(sum(q.y * q.y)) AS ny
       FROM vecs v JOIN cand USING (vec_id) JOIN qv q USING (j)
       GROUP BY v.vec_id)
SELECT vec_id, round(d / (nx * ny), 4) AS sim
FROM fp ORDER BY sim DESC, vec_id ASC LIMIT 10
"""


def q_dedup_exact(spark, sf_dir):
    return D.exact_duplicates(_docs_with_dups(spark, sf_dir)).orderBy(
        "doc_id")


SQL_DEDUP_EXACT = """
WITH """ + _DOCS_DUP_SQL + """,
h AS (SELECT doc_id, md5(text) AS digest FROM docs2),
g AS (SELECT doc_id, digest,
             min(doc_id) OVER (PARTITION BY digest) AS canonical_id,
             count(*) OVER (PARTITION BY digest) AS group_size
      FROM h)
SELECT doc_id, digest, canonical_id, group_size FROM g
WHERE group_size > 1 ORDER BY doc_id
"""


JACCARD_MAX_DF = 64  # hot-shingle candidate cap: bounds any candidate
# bucket at max_df^2 pairs (a single stop-shingle is otherwise a
# quadratic bucket at corpus scale); exact Jaccard on survivors.


def q_dedup_jaccard(spark, sf_dir):
    """n-gram Jaccard near-dups, registered in the df-CAPPED form (r2
    verdict: the uncapped default must never be the registered path).
    The oracle applies the identical cap, and test_round2 pins both the
    recall bound and the hot-shingle anti-join in the physical plan."""
    return (D.jaccard_pairs(_docs(spark, sf_dir), threshold=0.2,
                            max_df=JACCARD_MAX_DF)
            .orderBy("a_id", "b_id"))


SQL_DEDUP_JACCARD = ("WITH " + _SHINGLE_SQL + f""",
hot AS (SELECT shingle FROM sh GROUP BY shingle
        HAVING count(*) > {JACCARD_MAX_DF}),
cold AS (SELECT doc_id, shingle FROM sh
         WHERE shingle NOT IN (SELECT shingle FROM hot)),
cands AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM cold a JOIN cold b USING (shingle)
          WHERE a.doc_id < b.doc_id)
SELECT j.a_id, j.b_id, j.jaccard
FROM jac j JOIN cands c ON j.a_id = c.a_id AND j.b_id = c.b_id
WHERE j.jaccard >= 0.2
ORDER BY j.a_id, j.b_id""")


def q_dedup_minhash_lsh(spark, sf_dir):
    return (D.minhash_lsh_pairs(_docs(spark, sf_dir), n_hashes=16,
                                band_size=4, threshold=0.2)
            .orderBy("a_id", "b_id"))


SQL_DEDUP_MINHASH = ("WITH " + _SHINGLE_SQL + """,
seeds AS (SELECT CAST(unnest(range(0, 16)) AS INT) AS seed),
hv AS (SELECT doc_id, seed,
              CAST(('0x' || substr(md5('7:' || seed || ':' || shingle),
                                   1, 8)) AS BIGINT) AS hv
       FROM sh, seeds),
sig AS (SELECT doc_id, seed, min(hv) AS minhash
        FROM hv GROUP BY doc_id, seed),
banded AS (SELECT doc_id, CAST(floor(seed / 4) AS INT) AS band,
                  md5(array_to_string(list_sort(
                      list(seed || ':' || minhash)), ',')) AS band_key
           FROM sig GROUP BY doc_id, CAST(floor(seed / 4) AS INT)),
cands AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM banded a JOIN banded b
            ON a.band = b.band AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id)
SELECT c.a_id, c.b_id, j.jaccard
FROM cands c JOIN jac j ON c.a_id = j.a_id AND c.b_id = j.b_id
WHERE j.jaccard >= 0.2 ORDER BY c.a_id, c.b_id""")


def q_dedup_simhash(spark, sf_dir):
    return (D.simhash_pairs(_docs(spark, sf_dir), max_hamming=8)
            .orderBy("a_id", "b_id"))


SQL_DEDUP_SIMHASH = """
WITH tok AS (SELECT doc_id,
                    unnest(string_split_regex(trim(lower(text)),
                                              '\\s+')) AS tok
             FROM documents),
hv AS (SELECT doc_id,
              CAST(('0x' || substr(md5('13:' || tok), 1, 8)) AS BIGINT)
                  AS hv
       FROM tok WHERE tok <> ''),
bits AS (SELECT doc_id, j,
                CASE WHEN (hv >> j) & 1 = 1 THEN 1 ELSE -1 END AS vote
         FROM hv, (SELECT CAST(unnest(range(0, 32)) AS INT) AS j) jj),
votes AS (SELECT doc_id, j, sum(vote) AS v FROM bits GROUP BY doc_id, j),
sh AS (SELECT doc_id,
              CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << j)
                            ELSE 0 END) AS BIGINT) AS simhash
       FROM votes GROUP BY doc_id)
SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sh a, sh b
WHERE a.doc_id < b.doc_id AND bit_count(xor(a.simhash, b.simhash)) <= 8
ORDER BY a_id, b_id
"""


def q_dedup_embedding(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs — the vector-space member of
    the dedup family (exact / MinHash / SimHash / Jaccard / cosine).

    Registered in the CAPPED banded-LSH form (r3 verdict #5: the bucket
    self-join must carry a per-bucket df cap, exactly as the registered
    Jaccard carries JACCARD_MAX_DF; the uncapped broadcast-probe scan is
    never the registered path).

    The corpus is augmented with a scaled copy of each probe vector
    (vec_id+100000, 2x magnitude) so near-dup pairs provably exist:
    cosine is scale-invariant, so each (v, 2v) pair scores 1.0 while
    being byte-wise different — and sign-LSH puts v and 2v in the SAME
    bucket of every band by construction, so the LSH path must recover
    every planted pair (recall + cap semantics additionally pinned in
    pytest)."""
    emb = _emb(spark, sf_dir)
    scaled = emb.filter(F.col("vec_id") < 100).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: x * 2.0).alias("embedding"))
    aug = emb.select("vec_id", "embedding").unionByName(scaled)
    return (S.embedding_near_dup_pairs(aug, threshold=0.99, n_bands=2,
                                       band_planes=8, seed=42,
                                       max_bucket=S.EMBED_LSH_MAX_BUCKET)
            .orderBy("a_id", "b_id"))


SQL_DEDUP_EMBEDDING = f"""
WITH base AS (SELECT vec_id, embedding FROM embeddings),
aug AS MATERIALIZED (
    SELECT vec_id, embedding FROM base
    UNION ALL
    SELECT vec_id + 100000 AS vec_id,
           list_transform(embedding, x -> x * 2.0) AS embedding
    FROM base WHERE vec_id < 100),
vecs AS (SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
                CAST(unnest(embedding) AS DOUBLE) AS x
         FROM aug),
planes AS (SELECT p, j,
                  CAST(('0x' || substr(md5('lsh:42:' || p || ':' || j),
                                       1, 8)) AS BIGINT)
                      / 4294967296.0 - 0.5 AS w
           FROM (SELECT unnest(range(0, 16)) AS p),
                (SELECT unnest(range(0, 64)) AS j)),
dots AS (SELECT v.vec_id, pl.p, sum(v.x * pl.w) AS d
         FROM vecs v JOIN planes pl USING (j)
         GROUP BY v.vec_id, pl.p),
bkeys AS MATERIALIZED (
    SELECT vec_id, CAST(floor(p / 8) AS INT) AS band,
           CAST(sum(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << (p % 8))
                    ELSE 0 END) AS BIGINT) AS bkey
    FROM dots GROUP BY vec_id, CAST(floor(p / 8) AS INT)),
hot AS (SELECT band, bkey FROM bkeys GROUP BY band, bkey
        HAVING count(*) > {S.EMBED_LSH_MAX_BUCKET}),
cold AS (SELECT k.vec_id, k.band, k.bkey FROM bkeys k
         ANTI JOIN hot h ON k.band = h.band AND k.bkey = h.bkey),
cands AS (SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id
          FROM cold a JOIN cold b
            ON a.band = b.band AND a.bkey = b.bkey
           AND a.vec_id < b.vec_id),
pairs AS (SELECT c.a_id, c.b_id,
                 CAST(unnest(va.embedding) AS DOUBLE) AS x,
                 CAST(unnest(vb.embedding) AS DOUBLE) AS y
          FROM cands c
          JOIN aug va ON va.vec_id = c.a_id
          JOIN aug vb ON vb.vec_id = c.b_id),
sums AS (SELECT a_id, b_id, sum(x * y) AS d, sum(x * x) AS nx,
                sum(y * y) AS ny
         FROM pairs GROUP BY a_id, b_id)
SELECT a_id, b_id, round(d / (sqrt(nx) * sqrt(ny)), 4) AS sim
FROM sums WHERE round(d / (sqrt(nx) * sqrt(ny)), 4) >= 0.99
ORDER BY a_id, b_id
"""


def vector_queries() -> dict:
    return {
        "ann_brute_topk": q_ann_brute_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "semantic_geo_topk": q_semantic_geo_topk,
        "knn_label_vote": q_knn_label_vote,
        "dedup_exact": q_dedup_exact,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding": q_dedup_embedding,
    }


def vector_oracle_sql() -> dict:
    return {
        "ann_brute_topk": SQL_ANN_BRUTE,
        "ann_lsh_topk": SQL_ANN_LSH,
        "ann_ivf_topk": SQL_ANN_IVF,
        "semantic_geo_topk": SQL_SEMANTIC_GEO,
        "knn_label_vote": SQL_KNN_VOTE,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_jaccard": SQL_DEDUP_JACCARD,
        "dedup_minhash_lsh": SQL_DEDUP_MINHASH,
        "dedup_simhash": SQL_DEDUP_SIMHASH,
        "dedup_embedding": SQL_DEDUP_EMBEDDING,
    }
