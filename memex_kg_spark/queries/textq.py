"""Text-analysis + events queries with DuckDB oracle twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import textstats as T


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_token_stats(spark, sf_dir):
    return T.token_stats(_docs(spark, sf_dir)).orderBy("doc_id")


SQL_TOKEN_STATS = r"""
SELECT doc_id,
       CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
       CAST(CASE WHEN trim(coalesce(text, '')) = '' THEN 0
            ELSE len(string_split_regex(trim(coalesce(text, '')), '\s+'))
            END AS BIGINT) AS n_tokens,
       CAST(len(regexp_extract_all(coalesce(text, ''),
            '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_pieces
FROM documents ORDER BY doc_id
"""


def q_quality_scores(spark, sf_dir):
    """Quality scoring + language-ID in one per-doc audit row (merged r3
    for the 50-row budget; both computations run in full and every
    column is value-hashed)."""
    docs = _docs(spark, sf_dir)
    return (T.quality_scores(docs)
            .join(T.lang_id(docs), "doc_id")
            .orderBy("doc_id"))


SQL_QUALITY = r"""
WITH x AS (
    SELECT doc_id, coalesce(text, '') AS t,
           string_split_regex(trim(lower(coalesce(text, ''))), '\s+') AS toks
    FROM documents),
y AS (SELECT doc_id, t,
             length(t) AS n_chars,
             length(regexp_replace(t, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
             CASE WHEN trim(t) = '' THEN 0 ELSE len(toks) END AS n_toks,
             len(list_filter(toks, x -> list_contains(
                 ['the','and','of','to','a','in','is','it','that','for'],
                 x))) AS n_stop
      FROM x),
z AS (SELECT doc_id,
             CASE WHEN n_chars > 0 THEN n_punct / n_chars
                  ELSE 0.0 END AS punct_ratio,
             CASE WHEN n_toks > 0 THEN n_stop / n_toks
                  ELSE 0.0 END AS stop_ratio,
             CASE WHEN n_toks > 0 THEN
                  length(regexp_replace(t, '\s+', '', 'g')) / n_toks
                  ELSE 0.0 END AS mean_tok
      FROM y)
SELECT doc_id,
       round(punct_ratio, 6) AS punct_ratio,
       round(stop_ratio, 6) AS stopword_ratio,
       round(mean_tok, 6) AS mean_token_len,
       round((1.0 - least(1.0, punct_ratio * 4))
             * least(1.0, stop_ratio * 5), 6) AS quality_score
FROM z ORDER BY doc_id
"""

SQL_QUALITY_LANG = (
    "WITH quality AS (" + SQL_QUALITY.replace("ORDER BY doc_id", "") + """),
lx AS (SELECT doc_id,
              string_split_regex(trim(lower(coalesce(text, ''))),
                                 '\\s+') AS toks
       FROM documents),
lh AS (SELECT doc_id,
              len(list_filter(toks, x -> list_contains(
                  ['the','and','of','to','a','in','is','it','that','for'],
                  x))) AS hits_en,
              len(list_filter(toks, x -> list_contains(
                  ['el','la','los','las','de','y','un','una','es','que'],
                  x))) AS hits_es,
              len(list_filter(toks, x -> list_contains(
                  ['le','la','et','les','des','un','une','du','est','que'],
                  x))) AS hits_fr
       FROM lx),
lang AS (SELECT doc_id,
                CAST(hits_en AS BIGINT) AS hits_en,
                CAST(hits_es AS BIGINT) AS hits_es,
                CAST(hits_fr AS BIGINT) AS hits_fr,
                CASE WHEN greatest(hits_en, hits_es, hits_fr) <= 0
                          THEN 'und'
                     WHEN hits_en = greatest(hits_en, hits_es, hits_fr)
                          THEN 'en'
                     WHEN hits_es = greatest(hits_en, hits_es, hits_fr)
                          THEN 'es'
                     ELSE 'fr' END AS pred_lang
         FROM lh)
SELECT q.*, l.hits_en, l.hits_es, l.hits_fr, l.pred_lang
FROM quality q JOIN lang l USING (doc_id) ORDER BY doc_id
""")


def ordered_distinct_tags(docs):
    """A6: order-preserving distinct (the reference deduped Wikidata tag
    lists while keeping first-occurrence order, recursive_hops
    harvesting). First 10 distinct tokens per document in order of first
    appearance — groupBy(token) min(position), re-sorted by that
    position; no order-destroying array_distinct."""
    toks = (docs.select("doc_id",
                        F.posexplode(F.split(F.trim(F.lower(F.coalesce(
                            F.col("text"), F.lit("")))), r"\s+"))
                        .alias("pos", "tok"))
            .filter(F.col("tok") != ""))
    firsts = toks.groupBy("doc_id", "tok").agg(F.min("pos").alias("fp"))
    return (firsts.groupBy("doc_id")
            .agg(F.concat_ws(",", F.slice(F.transform(
                F.array_sort(F.collect_list(F.struct("fp", "tok"))),
                lambda s: s["tok"]), 1, 10)).alias("tags")))


def q_fingerprint(spark, sf_dir):
    """Document fingerprint (md5 of the sorted distinct token set) joined
    with the A6 order-preserving distinct tag list (merged r3)."""
    docs = _docs(spark, sf_dir)
    return (T.fingerprint(docs)
            .join(ordered_distinct_tags(docs), "doc_id", "left")
            .select("doc_id", "fingerprint",
                    F.coalesce("tags", F.lit("")).alias("tags"))
            .orderBy("doc_id"))


SQL_FINGERPRINT = r"""
WITH fp AS (
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(trim(lower(coalesce(text, ''))),
                                  '\s+'))), ' ')) AS fingerprint
    FROM documents),
toks AS (
    SELECT doc_id,
           generate_subscripts(string_split_regex(trim(lower(coalesce(
               text, ''))), '\s+'), 1) - 1 AS pos,
           unnest(string_split_regex(trim(lower(coalesce(text, ''))),
                  '\s+')) AS tok
    FROM documents),
firsts AS (SELECT doc_id, tok, min(pos) AS fp
           FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
tags AS (SELECT doc_id,
                array_to_string(list(tok ORDER BY fp, tok)[1:10], ',')
                    AS tags
         FROM firsts GROUP BY doc_id)
SELECT f.doc_id, f.fingerprint, coalesce(t.tags, '') AS tags
FROM fp f LEFT JOIN tags t USING (doc_id) ORDER BY f.doc_id
"""


def q_events_windowed(spark, sf_dir):
    """Events aggregations in one row (merged r3): ``part='win'`` —
    tumbling 5-minute window aggregation (the batch twin of the
    Structured Streaming path; window key is the epoch bucket so the
    oracle is engine-portable); ``part='json'`` — F13/F14 JSON traversal
    of the props payload column, aggregated by k % 10."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    bucket = (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 300)
    win = (e.groupBy(bucket.alias("key"), F.col("event_type"))
           .agg(F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long"))
                .alias("v"))
           .select(F.lit("win").alias("part"), "key", "event_type",
                   "n", "v"))
    js = (e.select("event_id",
                   F.get_json_object("props", "$.k").cast("int").alias("k"))
          .filter(F.col("k").isNotNull())
          .groupBy((F.col("k") % 10).cast("long").alias("key"))
          .agg(F.count("*").alias("n"), F.sum("k").alias("v"))
          .select(F.lit("json").alias("part"), "key",
                  F.lit(None).cast("string").alias("event_type"),
                  "n", "v"))
    return win.unionByName(js).orderBy("part", "key", "event_type")


SQL_EVENTS_WINDOWED = """
SELECT * FROM (
    SELECT 'win' AS part,
           CAST(floor(epoch(ts)) AS BIGINT)
               - CAST(floor(epoch(ts)) AS BIGINT) % 300 AS key,
           event_type, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v
    FROM events GROUP BY key, event_type
    UNION ALL
    SELECT 'json' AS part, CAST(k % 10 AS BIGINT) AS key,
           CAST(NULL AS VARCHAR) AS event_type, count(*) AS n,
           CAST(sum(k) AS BIGINT) AS v
    FROM (SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events)
    WHERE k IS NOT NULL GROUP BY k % 10)
ORDER BY part, key, event_type
"""


def q_events_sessionized(spark, sf_dir):
    """Sessionization: per-user session ids via lag(ts) + gap>30min
    cumsum (the classic window-function sessionizer), then session stats.
    """
    from pyspark.sql import Window
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (F.unix_timestamp("ts")
           - F.unix_timestamp(F.lag("ts").over(w))) > 1800
    sess = (e.withColumn("new_sess",
                         F.when(gap | F.lag("ts").over(w).isNull(), 1)
                         .otherwise(0))
            .withColumn("session_id",
                        F.sum("new_sess").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.count("*").alias("n_events"),
                 F.min("event_id").alias("first_event"),
                 F.max("event_id").alias("last_event"))
            .orderBy("user_id", "session_id"))


SQL_EVENTS_SESSION = """
WITH l AS (SELECT user_id, event_id, ts,
                  lag(ts) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_ts
           FROM events),
s AS (SELECT user_id, event_id,
             CASE WHEN prev_ts IS NULL
                       OR CAST(floor(epoch(ts)) AS BIGINT)
                          - CAST(floor(epoch(prev_ts)) AS BIGINT) > 1800
                  THEN 1 ELSE 0 END AS new_sess, ts
      FROM l),
c AS (SELECT user_id, event_id,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS session_id
      FROM s)
SELECT user_id, session_id, count(*) AS n_events,
       min(event_id) AS first_event, max(event_id) AS last_event
FROM c GROUP BY user_id, session_id ORDER BY user_id, session_id
"""


def text_queries() -> dict:
    return {
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "doc_fingerprint": q_fingerprint,
        "events_windowed": q_events_windowed,
        "events_sessionized": q_events_sessionized,
    }


def text_oracle_sql() -> dict:
    return {
        "token_stats": SQL_TOKEN_STATS,
        "quality_scores": SQL_QUALITY_LANG,
        "doc_fingerprint": SQL_FINGERPRINT,
        "events_windowed": SQL_EVENTS_WINDOWED,
        "events_sessionized": SQL_EVENTS_SESSION,
    }
