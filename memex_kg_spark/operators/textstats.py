"""Text analysis operators over document corpora (training-data pipeline).

Language-ID (stopword-hit heuristic), quality scoring (length / punct /
stopword ratios), token counting (whitespace + BPE-ish subword estimate),
and document fingerprinting. Everything is pure built-in column
expressions (codegen, no Python) and has an exact SQL twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "du", "est", "que"],
    "es": ["el", "la", "los", "las", "de", "y", "un", "una", "es", "que"],
}

_PUNCT_RE = r"[^a-zA-Z0-9\s]"
_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # crude BPE-ish pretokenizer


def _tokens(col):
    return F.split(F.trim(F.lower(col)), r"\s+")


def token_stats(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish piece count + char count."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    ws_tokens = F.when(F.trim(t) == "", 0).otherwise(
        F.size(F.split(F.trim(t), r"\s+")))
    pieces = F.size(F.regexp_extract_all(t, F.lit(_BPE_RE), 0))
    return df.select(
        id_col,
        F.length(t).cast("long").alias("n_chars"),
        ws_tokens.cast("long").alias("n_tokens"),
        pieces.cast("long").alias("n_pieces"))


def quality_scores(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: punctuation ratio, stopword ratio
    (English list), mean token length; plus a composite score."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t)
    n_punct = F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", ""))
    toks = _tokens(t)
    n_toks = F.when(F.trim(t) == "", 0).otherwise(F.size(toks))
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en, x)))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_toks > 0, n_stop / n_toks).otherwise(0.0)
    mean_tok = F.when(n_toks > 0,
                      (F.length(F.regexp_replace(t, r"\s+", "")))
                      / n_toks).otherwise(0.0)
    score = (F.lit(1.0)
             - F.least(F.lit(1.0), punct_ratio * 4)
             ) * F.least(F.lit(1.0), stop_ratio * 5)
    return df.select(
        id_col,
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality_score"))


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Stopword-vote language ID: argmax over per-language stopword hits,
    ties broken by language code order; 'und' when no stopword hits."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    toks = _tokens(t)
    hits = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, lambda x: F.array_contains(
            arr, x)))
    best = F.greatest(*hits.values())
    pred = (F.when(best <= 0, "und"))
    for lang in sorted(STOPWORDS):  # deterministic tie-break: code order
        pred = pred.when(hits[lang] == best, lang)
    return df.select(
        id_col,
        *[hits[lang].cast("long").alias(f"hits_{lang}")
          for lang in sorted(STOPWORDS)],
        pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted
    distinct token set (near-identical docs with shuffled word order
    collide — the 'fingerprinting' dedup family)."""
    toks = _tokens(F.coalesce(F.col(text_col), F.lit("")))
    fp = F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))
    return df.select(id_col, fp.alias("fingerprint"))
