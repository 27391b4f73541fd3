"""End-to-end corpus curation: quality gate → exact dedup → near dedup.

The composition a 100 TB training-data pipeline actually runs, built
from the individual operators (each separately oracle-gated):

1. exact dedup — keep the lowest doc_id per content hash (one shuffle
   on the digest);
2. near dedup — greedy drop of the higher doc_id of every confirmed
   MinHash-LSH pair (deterministic: independent of evaluation order,
   unlike clustering heuristics);
3. quality gate — drop low-quality survivors (narrow filter).

Order matters and is part of the contract: dedup first (so a
low-quality duplicate can't shadow a high-quality canonical), then
quality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from otel_arrow_spark.dataops.dedup import (
    DUP_CORPUS_SQL, minhash_lsh_pairs, minhash_lsh_pairs_oracle_sql,
)


def curate(corpus: DataFrame, near_tau: float = 0.8,
           min_quality: float = 0.3) -> DataFrame:
    """Returns the kept corpus rows with a ``drop_reason`` audit column
    (null = kept); filter ``drop_reason IS NULL`` for the clean corpus."""
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    with_rn = corpus.withColumn("_rn", F.row_number().over(w))

    near_drop = (
        minhash_lsh_pairs(corpus, tau=near_tau)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("_near_dup", F.lit(True))
    )
    # quality is a narrow expression — computed inline on the ranked
    # relation, NOT joined (a join would re-scan the corpus)
    from otel_arrow_spark.dataops.textstats import quality_score_col

    out = (
        with_rn.withColumn("quality_score", quality_score_col())
        .join(near_drop, "doc_id", "left")
        .withColumn(
            "drop_reason",
            F.when(F.col("_rn") > 1, F.lit("exact_dup"))
            .when(F.col("_near_dup"), F.lit("near_dup"))
            .when(F.col("quality_score") < min_quality, F.lit("low_quality")),
        )
        .drop("_rn", "_near_dup")
    )
    return out


def curation_stats(corpus: DataFrame, near_tau: float = 0.8,
                   min_quality: float = 0.3) -> DataFrame:
    """Per-source kept/dropped accounting (the curation MetricSet)."""
    return (
        curate(corpus, near_tau, min_quality)
        .groupBy("source", F.coalesce("drop_reason", F.lit("kept")).alias("outcome"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def curation_stats_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL,
                              near_tau: float = 0.8,
                              min_quality: float = 0.3) -> str:
    pairs = minhash_lsh_pairs_oracle_sql(corpus_sql, tau=near_tau)
    from otel_arrow_spark.dataops.textstats import quality_features_oracle_sql

    quality = quality_features_oracle_sql("corpus2")
    return f"""
WITH corpus2 AS ({corpus_sql}),
ranked AS (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY sha256(text) ORDER BY doc_id) AS INT) AS rn
  FROM corpus2
),
near AS (SELECT DISTINCT doc_b AS doc_id FROM ({pairs})),
q AS (SELECT doc_id, quality_score FROM ({quality}))
SELECT source,
  COALESCE(CASE WHEN rn > 1 THEN 'exact_dup'
                WHEN near.doc_id IS NOT NULL THEN 'near_dup'
                WHEN q.quality_score < {min_quality} THEN 'low_quality'
           END, 'kept') AS outcome,
  COUNT(*) AS n_docs
FROM ranked
LEFT JOIN near USING (doc_id)
JOIN q USING (doc_id)
GROUP BY 1, 2
"""


def curate_clustered(corpus: DataFrame, near_tau: float = 0.8,
                     min_quality: float = 0.3) -> DataFrame:
    """Cluster-canonical curation: near-dup CLUSTERS (connected
    components over the LSH pair graph) instead of greedy pair drops —
    within each cluster exactly the min-doc_id member survives, so a
    chain a~b, b~c keeps ONLY a (greedy pair-drop keeps a AND c even
    though they are transitively near-dups). Exact dups and the quality
    gate are unchanged from :func:`curate`; the cluster id is kept for
    audit."""
    from otel_arrow_spark.dataops.dedup import neardup_clusters

    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    clusters = neardup_clusters(corpus, tau=near_tau)
    from otel_arrow_spark.dataops.textstats import quality_score_col

    return (
        corpus.withColumn("_rn", F.row_number().over(w))
        .join(clusters, "doc_id")
        .withColumn("quality_score", quality_score_col())
        .withColumn(
            "drop_reason",
            F.when(F.col("_rn") > 1, F.lit("exact_dup"))
            .when(F.col("cluster_id") != F.col("doc_id"), F.lit("near_dup"))
            .when(F.col("quality_score") < min_quality, F.lit("low_quality")),
        )
        .drop("_rn")
    )


def curation_clustered_stats_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL,
                                        near_tau: float = 0.8,
                                        min_quality: float = 0.3) -> str:
    from otel_arrow_spark.dataops.dedup import neardup_clusters_oracle_sql
    from otel_arrow_spark.dataops.textstats import quality_features_oracle_sql

    clusters = neardup_clusters_oracle_sql(corpus_sql, tau=near_tau)
    quality = quality_features_oracle_sql("corpus3")
    return f"""
WITH corpus3 AS ({corpus_sql}),
ranked AS (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY sha256(text) ORDER BY doc_id) AS INT) AS rn
  FROM corpus3
),
cl AS (SELECT doc_id, cluster_id FROM ({clusters})),
q AS (SELECT doc_id, quality_score FROM ({quality}))
SELECT source,
  COALESCE(CASE WHEN rn > 1 THEN 'exact_dup'
                WHEN cl.cluster_id <> ranked.doc_id THEN 'near_dup'
                WHEN q.quality_score < {min_quality} THEN 'low_quality'
           END, 'kept') AS outcome,
  COUNT(*) AS n_docs
FROM ranked JOIN cl USING (doc_id) JOIN q USING (doc_id)
GROUP BY 1, 2
"""
