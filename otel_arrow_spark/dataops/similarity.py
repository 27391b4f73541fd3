"""Similarity search over embedding columns.

- :func:`brute_topk` — exact cosine top-k: broadcast the (small) query
  set against the full corpus; one narrow pass + per-query top-k window.
  The correctness baseline.
- :func:`lsh_ann_topk` — random-hyperplane LSH bucketing: the scale
  path. Hyperplane signs are derived from SHA-256 so the bucketing is
  deterministic and reproducible by the SQL oracle; candidates are
  co-bucketed vectors only, so the join fans out ~N/2^bits per query
  instead of N.

Both operators keep the dot-product as a sequential fold (deterministic
IEEE summation order → bit-identical to the DuckDB oracle).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from otel_arrow_spark.dataops.dedup import cosine, cosine_sql, dot, _to_double


def _query_filter(every: int):
    return F.col("vec_id") % every == 0


def brute_topk(emb: DataFrame, k: int = 5, every: int = 50) -> DataFrame:
    """Exact top-k neighbors for query vectors (vec_id % every == 0).

    The query side is broadcast — the corpus never shuffles; ranking is a
    window partitioned by query id (bounded: k rows survive per query).
    """
    queries = emb.filter(_query_filter(every)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    c = F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)
    scored = (
        emb.join(F.broadcast(queries), F.col("q_id") != F.col("vec_id"))
        .select("q_id", F.col("vec_id").alias("neighbor_id"), c.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def brute_topk_oracle_sql(k: int = 5, every: int = 50) -> str:
    cos = cosine_sql("q.embedding", "e.embedding")
    return f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         ROUND({cos}, 6) AS cos
  FROM embeddings q JOIN embeddings e ON q.vec_id != e.vec_id
  WHERE q.vec_id % {every} = 0
)
SELECT q_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# LSH (random hyperplane) bucketing
# ---------------------------------------------------------------------------

def hyperplane_signs(nbits: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes from SHA-256 (shared with the oracle)."""
    return [
        [
            1 if hashlib.sha256(f"hp|{j}|{d}".encode()).digest()[0] & 1 else -1
            for d in range(dim)
        ]
        for j in range(nbits)
    ]


def _bucket_expr(emb_col, planes: list[list[int]]):
    """Bucket id = sign bits of the hyperplane projections."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        proj = dot(
            _to_double(emb_col),
            F.array(*[F.lit(float(s)) for s in plane]),
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(emb: DataFrame, nbits: int = 4, dim: int = 64,
                 k: int = 5, every: int = 50) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.

    One narrow pass assigns buckets; the candidate join hits ~N/2^nbits
    rows per query. Recall is tunable via nbits (fewer bits → bigger
    buckets → higher recall); multi-probe is the standard extension.
    """
    planes = hyperplane_signs(nbits, dim)
    bucketed = emb.withColumn("bucket", _bucket_expr(F.col("embedding"), planes))
    queries = bucketed.filter(_query_filter(every)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    c = F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)
    scored = (
        bucketed.join(
            F.broadcast(queries),
            (F.col("q_bucket") == F.col("bucket"))
            & (F.col("q_id") != F.col("vec_id")),
        )
        .select("q_id", F.col("vec_id").alias("neighbor_id"), c.alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_ann_topk(emb: DataFrame, centroid_stride: int = 100, k: int = 5,
                 every: int = 50) -> DataFrame:
    """IVF-style ANN: coarse-quantize to the nearest centroid, search
    within the query's cell.

    Centroids are a deterministic corpus sample (``vec_id % stride == 1``)
    — the reproducible stand-in for trained k-means centroids; swapping in
    trained centroids changes only the centroid relation. The assignment
    pass is a broadcast cross-score + argmax (N·C cosines, one narrow
    stage); the search join then touches ~N/C candidates per query.
    Multi-probe (nearest P cells) is the standard recall extension.
    """
    centroids = emb.filter(F.col("vec_id") % centroid_stride == 1).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
    )
    sim = cosine(F.col("embedding"), F.col("c_emb"))
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.col("csim").desc(), F.col("centroid_id")
    )
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "centroid_id", sim.alias("csim"))
        .withColumn("arank", F.row_number().over(w_assign))
        .filter(F.col("arank") == 1)
        .select("vec_id", "embedding", F.col("centroid_id").alias("cell"))
    )
    queries = assigned.filter(_query_filter(every)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell").alias("q_cell"),
    )
    c = F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)
    scored = assigned.join(
        F.broadcast(queries),
        (F.col("q_cell") == F.col("cell")) & (F.col("q_id") != F.col("vec_id")),
    ).select("q_id", F.col("vec_id").alias("neighbor_id"), c.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_ann_topk_oracle_sql(centroid_stride: int = 100, k: int = 5,
                            every: int = 50) -> str:
    csim = cosine_sql("e.embedding", "c.embedding")
    cos = cosine_sql("q.embedding", "e.embedding")
    return f"""
WITH assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.vec_id AS cell,
           CAST(row_number() OVER (PARTITION BY e.vec_id
                ORDER BY {csim} DESC, c.vec_id) AS INT) AS arank
    FROM embeddings e
    CROSS JOIN (SELECT vec_id, embedding FROM embeddings
                WHERE vec_id % {centroid_stride} = 1) c
  ) WHERE arank = 1
),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         ROUND({cos}, 6) AS cos
  FROM assigned q JOIN assigned e
    ON q.cell = e.cell AND q.vec_id != e.vec_id
  WHERE q.vec_id % {every} = 0
)
SELECT q_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def lsh_ann_topk_oracle_sql(nbits: int = 4, dim: int = 64, k: int = 5,
                            every: int = 50) -> str:
    planes = hyperplane_signs(nbits, dim)
    proj_terms = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(f"{float(s)}" for s in plane) + "]"
        d = (
            "list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(list_zip(embedding, {arr}::DOUBLE[]), "
            "p -> p[1]::DOUBLE * p[2]::DOUBLE)), (x, y) -> x + y)"
        )
        proj_terms.append(f"(CASE WHEN {d} > 0 THEN {1 << j} ELSE 0 END)")
    bucket = " + ".join(proj_terms)
    cos = cosine_sql("q.embedding", "e.embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         ROUND({cos}, 6) AS cos
  FROM bucketed q JOIN bucketed e
    ON q.bucket = e.bucket AND q.vec_id != e.vec_id
  WHERE q.vec_id % {every} = 0
)
SELECT q_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""
