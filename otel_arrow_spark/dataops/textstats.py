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

from pyspark.sql import Column, DataFrame, Window
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


# ---------------------------------------------------------------------------
# repetition signals (Gopher-style quality rules)
# ---------------------------------------------------------------------------

def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document repetition signals, the Gopher/MassiveText quality
    rules adapted to whitespace tokens: the fraction of duplicate words
    (1 - distinct/total, computed NARROWLY with array_distinct — no
    shuffle), and the fraction of all unigrams/bigrams taken by the
    single most frequent gram (`top_word_frac`, `top_bigram_frac`).

    Scale shape: ONE posexplode feeds both gram sizes (unigrams and
    bigrams concatenated, tagged by `n`), one hash aggregation keyed on
    (doc_id, n, gram) with map-side partials, then a per-(doc_id, n)
    max/sum rollup pivoted by conditional aggregation — two narrow-key
    shuffles total, no skew risk beyond a single pathological document
    (bounded by doc length, not corpus size). Rounded to 6 places for
    the cross-engine oracle hash (`repetition_stats_oracle_sql`).
    """
    t = F.col(text_col)
    w = words_of(t)
    m = F.size(w)
    big = F.zip_with(
        F.slice(w, F.lit(1), F.greatest(m - 1, F.lit(0))),
        F.slice(w, F.lit(2), F.greatest(m - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = docs.select(
        "doc_id",
        (F.lit(1.0) - F.size(F.array_distinct(w)) / F.greatest(m, F.lit(1)))
        .alias("dup_word_frac_raw"),
        F.explode(
            F.concat(
                F.transform(w, lambda x: F.struct(
                    F.lit(1).alias("n"), x.alias("gram"))),
                F.transform(big, lambda x: F.struct(
                    F.lit(2).alias("n"), x.alias("gram"))),
            )
        ).alias("g"),
    )
    counts = grams.groupBy(
        "doc_id", F.col("g.n").alias("n"), F.col("g.gram").alias("gram"),
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.first("dup_word_frac_raw").alias("dupf"),
    )
    per_n = counts.groupBy("doc_id").agg(
        F.round(F.first("dupf"), 6).alias("dup_word_frac"),
        F.round(
            F.max(F.when(F.col("n") == 1, F.col("c")))
            / F.sum(F.when(F.col("n") == 1, F.col("c"))), 6
        ).alias("top_word_frac"),
        F.round(
            F.max(F.when(F.col("n") == 2, F.col("c")))
            / F.greatest(F.sum(F.when(F.col("n") == 2, F.col("c"))),
                         F.lit(1)), 6
        ).alias("top_bigram_frac"),
    )
    return per_n


def repetition_stats_oracle_sql(table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM {table}
), grams AS (
  SELECT doc_id, 1 AS n, unnest(w) AS gram FROM toks
  UNION ALL
  SELECT doc_id, 2 AS n,
         unnest(list_transform(range(1, greatest(len(w), 1)),
                               i -> w[i] || ' ' || w[i + 1])) AS gram
  FROM toks
), counts AS (
  SELECT doc_id, n, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2, 3
), dup AS (
  SELECT doc_id,
         ROUND(1.0 - len(list_distinct(w))
               / CAST(greatest(len(w), 1) AS DOUBLE), 6) AS dup_word_frac
  FROM toks
)
SELECT d.doc_id, d.dup_word_frac,
  ROUND(MAX(CASE WHEN n = 1 THEN c END)
        / CAST(SUM(CASE WHEN n = 1 THEN c END) AS DOUBLE), 6)
    AS top_word_frac,
  ROUND(MAX(CASE WHEN n = 2 THEN c END)
        / CAST(greatest(SUM(CASE WHEN n = 2 THEN c END), 1) AS DOUBLE), 6)
    AS top_bigram_frac
FROM counts JOIN dup d USING (doc_id)
GROUP BY d.doc_id, d.dup_word_frac
"""


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the Java-regex ∩ RE2 common subset (no
# lookaround, no backrefs) so the DuckDB oracle runs the SAME regexes.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\+?\d[\d -]{7,}\d\b"


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / phone-shaped digit runs with
    typed placeholders and count each kind — the scrubbing pass every
    web-scale training corpus runs before tokenization. Entirely
    JVM-side: three chained regexp_replace (email first — its local
    part may contain digit runs a later phone pass would half-eat) plus
    regexp_extract_all sizes for the counts; narrow, zero shuffle.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PII_PHONE_RE, "<PHONE>")
    return docs.select(
        "doc_id",
        red.alias("redacted"),
        F.size(F.regexp_extract_all(t, F.lit(PII_EMAIL_RE), F.lit(0)))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(
            F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
            F.lit(PII_IPV4_RE), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(
            F.regexp_replace(
                F.regexp_replace(t, PII_EMAIL_RE, "<EMAIL>"),
                PII_IPV4_RE, "<IP>"),
            F.lit(PII_PHONE_RE), F.lit(0))).alias("n_phones"),
    )


def redact_pii_oracle_sql(table: str = "documents",
                          text_expr: str = "text") -> str:
    e, i, p = PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE
    return f"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(
    {text_expr}, '{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'),
    '{p}', '<PHONE>', 'g') AS redacted,
  len(regexp_extract_all({text_expr}, '{e}')) AS n_emails,
  len(regexp_extract_all(regexp_replace({text_expr}, '{e}', '<EMAIL>', 'g'),
      '{i}')) AS n_ips,
  len(regexp_extract_all(regexp_replace(regexp_replace(
      {text_expr}, '{e}', '<EMAIL>', 'g'), '{i}', '<IP>', 'g'),
      '{p}')) AS n_phones
FROM {table}
"""


# ---------------------------------------------------------------------------
# bigram language-model scoring (perplexity-style quality filter)
# ---------------------------------------------------------------------------

def bigram_lm_scores(docs: DataFrame, text_col: str = "text",
                     k: float = 0.5) -> DataFrame:
    """Perplexity-style quality scoring against a bigram LM trained on
    the corpus itself — the CCNet-shaped filter (score docs by how
    (un)usual their token transitions are) with no external model: the
    LM is the corpus's own add-k-smoothed bigram table, so the whole
    thing is deterministic and self-contained.

    score(doc) = mean over its bigrams of
    ``log((C(w1,w2) + k) / (C(w1) + k·V))`` with V = distinct unigram
    vocabulary. Unusual/garbled text scores low; repetitive/common text
    scores high.

    Scale shape: the doc-side bigrams are PRE-AGGREGATED to per-doc
    multiplicities before anything else — one row per (doc, w1, w2)
    instead of one per bigram instance — which shrinks both the join
    shuffle and the skew exposure on hot ``w1`` tokens (a stop-word's
    fan-in collapses from its instance count to its distinct-context
    count). The bigram count relation derives from that SAME persisted
    pre-aggregation (no second scan of the corpus), and ``uni_counts``
    is persisted across its two uses (the vocab scalar + the scoring
    join). The scoring join stays a plain shuffle equi-join ON THE
    BIGRAM KEY that co-partitions both sides (never a broadcast: at
    100 TB the bigram table is corpus-sized), then one per-doc
    aggregation. Unseen bigrams (scoring docs outside the training
    corpus) fall back to the smoothing mass via the left join's
    COALESCE. Persists are registered for
    :func:`~otel_arrow_spark.dataops.dedup.release_caches`.
    """
    from otel_arrow_spark.dataops.dedup import persist_registered

    w = words_of(F.col(text_col))
    m = F.size(w)
    big = F.zip_with(
        F.slice(w, F.lit(1), F.greatest(m - 1, F.lit(0))),
        F.slice(w, F.lit(2), F.greatest(m - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    doc_bigrams = docs.select(
        "doc_id", F.explode(big).alias("g")
    ).select("doc_id", F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
    doc_bg = persist_registered(
        doc_bigrams.groupBy("doc_id", "w1", "w2").agg(
            F.count(F.lit(1)).alias("mult"))
    )

    bi_counts = doc_bg.groupBy("w1", "w2").agg(
        F.sum("mult").alias("c12"))
    uni_counts = persist_registered(
        docs.select(F.explode(w).alias("w1")).groupBy("w1").agg(
            F.count(F.lit(1)).alias("c1"))
    )
    vocab = uni_counts.count()  # one scalar: the smoothing denominator

    scored = (
        doc_bg
        .join(bi_counts, ["w1", "w2"], "left")
        .join(uni_counts, ["w1"], "left")
        .select(
            "doc_id",
            "mult",
            F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k * vocab))
            ).alias("logp"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.sum("mult").alias("n_bigrams"),
        F.round(
            F.sum(F.col("mult") * F.col("logp")) / F.sum("mult"), 6
        ).alias("avg_logp"),
    )


def bigram_lm_scores_oracle_sql(table: str = "documents",
                                k: float = 0.5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM {table}
), dbg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(w), 1)),
                               i -> struct_pack(w1 := w[i],
                                                w2 := w[i + 1]))) AS g
  FROM toks
), db AS (
  SELECT doc_id, g.w1 AS w1, g.w2 AS w2 FROM dbg
), bg AS (
  -- doc-side pre-aggregation: one row per (doc, bigram) with its
  -- multiplicity — mirrors the engine's skew-shrinking join input
  SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS mult
  FROM db GROUP BY 1, 2, 3
), bi AS (
  SELECT w1, w2, CAST(SUM(mult) AS BIGINT) AS c12 FROM bg GROUP BY 1, 2
), uni AS (
  SELECT unnest(w) AS w1 FROM toks
), uc AS (
  SELECT w1, COUNT(*) AS c1 FROM uni GROUP BY 1
), v AS (SELECT COUNT(*) AS vocab FROM uc)
SELECT bg.doc_id, CAST(SUM(bg.mult) AS BIGINT) AS n_bigrams,
  ROUND(SUM(bg.mult * ln((COALESCE(bi.c12, 0) + {k})
              / (COALESCE(uc.c1, 0) + {k} * v.vocab))) / SUM(bg.mult), 6)
    AS avg_logp
FROM bg
LEFT JOIN bi USING (w1, w2)
LEFT JOIN uc USING (w1)
CROSS JOIN v
GROUP BY bg.doc_id
"""


def tfidf_keywords(docs: DataFrame, k: int = 3,
                   text_col: str = "text") -> DataFrame:
    """Top-k tf-idf keywords per document (self-contained: idf is
    trained on the corpus itself, like :func:`bigram_lm_scores`).

    ``score = tf · (ln((N+1)/(df+1)) + 1)`` — the smoothed-idf form
    that never divides by zero. Scores are rounded to 6 dp BEFORE
    ranking so the cross-engine rank never depends on the last ULPs of
    ``ln``; ties then break on the term ascending, making the top-k
    fully deterministic.

    Scale shape: term frequencies are a per-(doc, term) aggregation
    (map-side combinable), document frequency derives from that SAME
    relation (persisted — no second corpus scan), and the df join is a
    plain shuffle equi-join on the term key (never broadcast: the
    vocabulary is corpus-sized; stop-word fan-in is per-DISTINCT-doc,
    already collapsed by the tf pre-aggregation, and AQE's skew-join
    splits anything residual). The top-k is one Window rank inside
    each doc partition. N is the one bounded driver scalar (same
    contract as bigram_lm's vocab count).
    """
    from otel_arrow_spark.dataops.dedup import persist_registered

    toks = docs.select(
        "doc_id", F.explode(words_of(F.lower(F.col(text_col)))).alias("w")
    ).filter(F.length("w") > 0)
    tf = persist_registered(
        toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf")))
    n_docs = docs.count()  # bounded 1-row scalar
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("dfq"))
    scored = tf.join(dfreq, "w").select(
        "doc_id",
        F.col("w").alias("keyword"),
        F.round(
            F.col("tf")
            * (F.log(F.lit(float(n_docs + 1)) / (F.col("dfq") + 1))
               + 1),
            6,
        ).alias("score"),
    )
    win = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("keyword").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(win))
        .filter(F.col("rnk") <= k)
    )


def tfidf_keywords_oracle_sql(table: str = "documents",
                              k: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
  FROM {table}
), t2 AS (SELECT doc_id, w FROM toks WHERE length(w) > 0),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM t2 GROUP BY 1, 2),
dfq AS (SELECT w, COUNT(*) AS dfq FROM tf GROUP BY 1),
nd AS (SELECT COUNT(*) AS n FROM {table}),
sc AS (
  SELECT tf.doc_id, tf.w AS keyword,
         round(tf.tf * (ln(CAST(nd.n + 1 AS DOUBLE) / (dfq.dfq + 1))
               + 1), 6) AS score
  FROM tf JOIN dfq ON tf.w = dfq.w CROSS JOIN nd
)
SELECT doc_id, keyword, score, CAST(rnk AS INTEGER) AS rnk FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY score DESC, keyword) AS rnk
  FROM sc) WHERE rnk <= {k}
"""
