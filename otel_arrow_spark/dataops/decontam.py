"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set.

The standard pre-training hygiene step (n-gram collision decontamination
as practiced publicly by GPT-3 Appendix C / PaLM / Llama — 8-13 word
n-grams): any training document sharing at least ``min_shared`` distinct
n-grams with any benchmark document is flagged (and typically dropped or
split). Reuses the exact shingling + cross-engine SHA hashing building
blocks of the dedup family (`hashing.shingles`).

Scale design (100 TB corpus, bounded benchmark):

- The benchmark side is SMALL by definition (an eval suite: 10^3-10^6
  documents). Its exploded distinct-shingle relation is broadcast, so
  the corpus-side scan is a single narrow pass: shingle, explode,
  broadcast-hash-join, partial-aggregated count per doc. NO shuffle of
  corpus text, no corpus self-join.
- Stop-grams: an n-gram occurring in more than ``max_bench_df``
  benchmark documents is dropped from the probe set before the join
  (boilerplate/license headers would otherwise match everything —
  the same hot-key discipline as the LSH bucket cap,
  `dedup._cap_buckets`). Applied on the tiny side, so it is free.
- If the benchmark outgrows broadcast (~GB of distinct shingles), the
  drop-in replacement is a shuffle hash join on the shingle key — the
  corpus side is already exploded; nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from otel_arrow_spark.dataops.hashing import shingles, shingles_sql, words_of

DEFAULT_NGRAM = 8  # public-practice collision width (8-13 words)


def benchmark_set(docs: DataFrame, modulus: int = 97) -> DataFrame:
    """Deterministic stand-in benchmark: every ``modulus``-th doc_id.

    In production this is the real eval-suite corpus; the synthetic
    split keeps the gate reproducible with no external data.
    """
    return docs.filter(F.col("doc_id") % modulus == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )


def bench_ngrams(bench: DataFrame, n: int = DEFAULT_NGRAM,
                 max_bench_df: int | None = None) -> DataFrame:
    """(bench_id, sh): the benchmark probe set — exploded distinct
    word n-grams, optionally with stop-grams (document frequency >
    ``max_bench_df`` within the benchmark) removed."""
    ng = bench.select(
        "bench_id",
        F.explode(shingles(words_of(F.col("text")), n)).alias("sh"),
    )
    if max_bench_df is not None:
        keep = (
            ng.groupBy("sh")
            .agg(F.countDistinct("bench_id").alias("_df"))
            .filter(F.col("_df") <= max_bench_df)
            .select("sh")
        )
        ng = ng.join(keep, "sh")
    return ng


def contamination_flags(docs: DataFrame, bench: DataFrame,
                        n: int = DEFAULT_NGRAM, min_shared: int = 1,
                        max_bench_df: int | None = None) -> DataFrame:
    """(doc_id, shared_ngrams, n_bench_docs, first_bench_id): training
    docs overlapping the benchmark by ≥ ``min_shared`` distinct n-grams.

    One corpus pass: shingle → explode → broadcast join against the
    benchmark probe set → map-side-combinable distinct-count per doc.
    Benchmark documents themselves are excluded from the output (a
    bench doc trivially matches itself when both sides derive from the
    same corpus).
    """
    probe = bench_ngrams(bench, n, max_bench_df)
    dsh = docs.select(
        "doc_id", F.explode(shingles(words_of(F.col("text")), n)).alias("sh")
    )
    hits = dsh.join(F.broadcast(probe), "sh").filter(
        F.col("doc_id") != F.col("bench_id")
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.countDistinct("sh").alias("shared_ngrams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
            F.min("bench_id").alias("first_bench_id"),
        )
        .filter(F.col("shared_ngrams") >= min_shared)
    )


def decontaminate(docs: DataFrame, bench: DataFrame,
                  n: int = DEFAULT_NGRAM, min_shared: int = 1,
                  max_bench_df: int | None = None) -> DataFrame:
    """The corpus minus contaminated docs (left-anti on the flags) —
    the shape a curation pipeline composes before tokenization."""
    flags = contamination_flags(docs, bench, n, min_shared, max_bench_df)
    return docs.join(flags.select("doc_id"), "doc_id", "anti")


def contamination_flags_oracle_sql(n: int = DEFAULT_NGRAM,
                                   min_shared: int = 1,
                                   modulus: int = 97,
                                   table: str = "documents") -> str:
    """DuckDB rendition of :func:`contamination_flags` over
    :func:`benchmark_set` (no stop-gram filter — pass
    ``max_bench_df=None`` on the Spark side to match)."""
    sh = shingles_sql("w", n)
    return f"""
WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM {table}),
bsh AS (SELECT DISTINCT doc_id AS bench_id, unnest({sh}) AS sh
        FROM d WHERE doc_id % {modulus} = 0),
dsh AS (SELECT DISTINCT doc_id, unnest({sh}) AS sh FROM d),
hits AS (SELECT dsh.doc_id, dsh.sh, bsh.bench_id
         FROM dsh JOIN bsh USING (sh) WHERE dsh.doc_id != bsh.bench_id)
SELECT doc_id,
       CAST(COUNT(DISTINCT sh) AS BIGINT) AS shared_ngrams,
       CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_docs,
       MIN(bench_id) AS first_bench_id
FROM hits GROUP BY doc_id
HAVING COUNT(DISTINCT sh) >= {min_shared}
"""
