"""Text analysis for corpus curation: language ID, quality scoring,
token counting, document fingerprinting.

All operators are pure narrow transformations (no shuffle) built from
native Spark SQL functions — they run inside whole-stage codegen and
scale linearly with input splits. Each operator ships a DuckDB oracle
builder (``*_oracle_sql``) so the driver's correctness gate covers it.

Reference analog: the recordset engine's text scalar surface
(`rust/experimental/query_engine/engine-recordset/src/scalars/
text_scalar_expressions.rs:17-185`) provides the primitives; the
composition into curation signals is the 100 TB-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otel_arrow_spark.dataops.hashing import (
    h32, h32_sql, shingles, shingles_sql, words_of,
)

# BPE-ish token pattern: word pieces or single non-space punctuation.
TOKEN_RE = r"\w+|[^\w\s]"
PUNCT_RE = r"[.,!?;:]"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Order = deterministic tie-break precedence.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "fr": ["le", "la", "de", "et", "les", "des", "une", "du", "au", "en"],
    "de": ["der", "die", "das", "und", "den", "von", "zu", "mit", "ist", "in"],
    "zh": ["的", "了", "是", "我", "不", "在", "有", "他", "这", "中"],
}


# ---------------------------------------------------------------------------
# token counting
# ---------------------------------------------------------------------------

def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return docs.select(
        "doc_id",
        F.size(F.split(F.trim(t), r"\s+")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(TOKEN_RE), F.lit(0))).alias(
            "n_regex_tokens"
        ),
        F.length(t).alias("n_chars"),
    )


def token_counts_oracle_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id,
  len(regexp_split_to_array(trim(text), '\\s+')) AS n_ws_tokens,
  len(regexp_extract_all(text, '{TOKEN_RE}')) AS n_regex_tokens,
  length(text) AS n_chars
FROM {table}
"""


# ---------------------------------------------------------------------------
# quality scoring
# ---------------------------------------------------------------------------

def quality_score_col(text_col: str = "text") -> Column:
    """The composite quality score as a bare Column — compose it inline
    (narrow) instead of joining a separate quality relation."""
    t = F.col(text_col)
    w = words_of(t)
    n_words = F.size(w)
    n_chars = F.length(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, PUNCT_RE, ""))
    stop_hits = F.size(F.filter(w, lambda x: x.isin(*STOPWORDS["en"])))
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6)
    len_sig = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    punct_sig = F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))
    stop_sig = F.least(stop_ratio * 5, F.lit(1.0))
    return F.round((len_sig + punct_sig + stop_sig) / 3, 6)


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword signals + a composite [0,1] score.

    Score = mean of three clamped sub-signals (length in sweet spot,
    low punctuation density, healthy stopword ratio). Deterministic,
    fully JVM-side.
    """
    t = F.col(text_col)
    w = words_of(t)
    n_words = F.size(w)
    n_chars = F.length(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, PUNCT_RE, ""))
    stop_hits = F.size(
        F.filter(w, lambda x: x.isin(*STOPWORDS["en"]))
    )
    punct_ratio = F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6)
    stop_ratio = F.round(stop_hits / F.greatest(n_words, F.lit(1)), 6)
    len_sig = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    punct_sig = F.lit(1.0) - F.least(punct_ratio * 10, F.lit(1.0))
    stop_sig = F.least(stop_ratio * 5, F.lit(1.0))
    score = F.round((len_sig + punct_sig + stop_sig) / 3, 6)
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
        (score >= 0.5).alias("is_good"),
    )


def quality_features_oracle_sql(table: str = "documents") -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS["en"])
    return f"""
SELECT doc_id, n_words, punct_ratio, stop_ratio, quality_score,
       quality_score >= 0.5 AS is_good
FROM (
  SELECT doc_id, n_words, punct_ratio, stop_ratio,
    ROUND((least(n_chars / 200.0, 1.0) +
           (1.0 - least(punct_ratio * 10, 1.0)) +
           least(stop_ratio * 5, 1.0)) / 3, 6) AS quality_score
  FROM (
    SELECT doc_id,
      len(string_split(text, ' ')) AS n_words,
      length(text) AS n_chars,
      ROUND((length(text) - length(regexp_replace(text, '{PUNCT_RE}', '', 'g')))
            / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio,
      ROUND(len(list_filter(string_split(text, ' '), x -> x IN ({stop})))
            / greatest(len(string_split(text, ' ')), 1)::DOUBLE, 6) AS stop_ratio
    FROM {table}
  )
)
"""


# ---------------------------------------------------------------------------
# language identification
# ---------------------------------------------------------------------------

def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID with deterministic precedence tie-break.

    ``pred_lang`` = argmax over per-language stopword hit counts; ties
    resolved by the fixed order of :data:`STOPWORDS`. ``best_hits`` = the
    winning count (0 → 'und', undetermined).
    """
    w = F.array_distinct(words_of(F.col(text_col)))
    hits = {
        lang: F.size(F.array_intersect(w, F.array(*[F.lit(s) for s in sw])))
        for lang, sw in STOPWORDS.items()
    }
    best = F.greatest(*hits.values())
    pred = F.lit("und")
    for lang in reversed(list(STOPWORDS)):  # earlier langs win ties
        pred = F.when(hits[lang] == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best > 0, pred).otherwise(F.lit("und"))
    return docs.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        pred.alias("pred_lang"),
        best.alias("best_hits"),
    )


def lang_id_oracle_sql(table: str = "documents") -> str:
    hit_exprs = {
        lang: (
            f"len(list_intersect(w, [{', '.join(repr(s) for s in sw)}]))"
        )
        for lang, sw in STOPWORDS.items()
    }
    hit_cols = ", ".join(f"{e} AS h_{k}" for k, e in hit_exprs.items())
    best = "greatest(" + ", ".join(f"h_{k}" for k in STOPWORDS) + ")"
    case = "CASE "
    for lang in STOPWORDS:
        case += f"WHEN h_{lang} = best THEN '{lang}' "
    case += "END"
    return f"""
SELECT doc_id, label_lang, pred_lang, best_hits FROM (
  SELECT doc_id, lang AS label_lang,
    CASE WHEN best > 0 THEN {case} ELSE 'und' END AS pred_lang,
    best AS best_hits
  FROM (
    SELECT doc_id, lang, {best} AS best,
           h_en, h_es, h_fr, h_de, h_zh
    FROM (
      SELECT doc_id, lang, {hit_cols}
      FROM (SELECT doc_id, lang,
                   list_distinct(string_split(text, ' ')) AS w
            FROM {table})
    )
  )
)
"""


# ---------------------------------------------------------------------------
# document fingerprinting
# ---------------------------------------------------------------------------

def fingerprints(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Shingle-hash fingerprints: min-hash (order stat) and xor-fold.

    ``fp_min`` is a 1-coordinate MinHash (locality-sensitive: equal for
    near-identical docs with high probability); ``fp_xor`` is an
    order-independent content checksum over distinct shingles (exact-set
    identity). Reference analog: content-hash dedup of resources/scopes
    (`go/pkg/otel/logs/arrow/optimizer.go:63-106`).
    """
    sh = shingles(words_of(F.col(text_col)), n)
    # materialize the hashed array once — fp_min and fp_xor both consume
    # it, and Spark does not CSE the SHA subtree across output columns
    hashed = docs.select(
        "doc_id", F.transform(sh, lambda s: h32(s)).alias("hashed")
    )
    fp_xor = F.aggregate(
        F.col("hashed"), F.lit(0).cast("bigint"), lambda acc, x: acc.bitwiseXOR(x)
    )
    return hashed.select(
        "doc_id",
        F.array_min(F.col("hashed")).alias("fp_min"),
        fp_xor.alias("fp_xor"),
    )


def fingerprints_oracle_sql(table: str = "documents", n: int = 3) -> str:
    sh = shingles_sql("w", n)
    return f"""
SELECT doc_id,
  list_min(hashed) AS fp_min,
  list_reduce(list_prepend(0::BIGINT, hashed), (a, b) -> xor(a, b)) AS fp_xor
FROM (
  SELECT doc_id, list_transform({sh}, s -> {h32_sql('s')}) AS hashed
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {table})
)
"""


# ---------------------------------------------------------------------------
# scale path: Karp-Rabin rolling fingerprint (Arrow-vectorized)
# ---------------------------------------------------------------------------

def rolling_fingerprints_pandas(docs: DataFrame, text_col: str = "text",
                                window: int = 16) -> DataFrame:
    """numpy Karp-Rabin rolling-hash fingerprint over raw bytes.

    The production fingerprint for 100 TB corpora: one vectorized pass,
    no shingle materialization. Cross-checked in tests for dedup
    consistency (equal texts → equal fingerprints); not SQL-expressible,
    so it carries no driver oracle (pytest covers it).
    """
    import numpy as np
    import pandas as pd

    B, M = 257, (1 << 31) - 1  # max term: window * 255 * M < 2^64

    def _fp(it):
        for pdf in it:
            texts = pdf[text_col].astype(str)
            # One concatenated byte buffer per batch; doc boundaries via
            # offsets → all window hashes in one vectorized pass.
            bufs = [s.encode("utf-8") for s in texts]
            out = np.zeros(len(pdf), dtype=np.int64)
            for i, raw in enumerate(bufs):  # per-doc numpy, no char loops
                b = np.frombuffer(raw, dtype=np.uint8)
                if len(b) == 0:
                    continue
                w = min(window, len(b))
                powers = np.array(
                    [pow(B, w - 1 - j, M) for j in range(w)], dtype=np.uint64
                )
                wins = np.lib.stride_tricks.sliding_window_view(b, w)
                rolls = (wins.astype(np.uint64) * powers).sum(axis=1) % M
                out[i] = int(rolls.min())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "fp_roll": out})

    return docs.select("doc_id", text_col).mapInPandas(
        _fp, "doc_id long, fp_roll long"
    )
