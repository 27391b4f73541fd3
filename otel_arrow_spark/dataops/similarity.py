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
                 k: int = 5, every: int = 50, probes: int = 1) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s).

    One narrow pass assigns buckets; the candidate join hits
    ~P·N/2^nbits rows per query. Recall is tunable two ways: fewer bits
    (bigger buckets) or ``probes`` > 1 — **multi-probe**: in addition to
    the query's own bucket, probe the buckets at Hamming distance 1
    (each single sign-bit flip), the standard recall extension for
    hyperplane LSH. Probing happens on the (tiny, broadcast) query side
    — the corpus is bucketed exactly once and never re-shuffled; each
    corpus vector lives in one bucket, and probe buckets are distinct,
    so candidates need no dedup.
    """
    planes = hyperplane_signs(nbits, dim)
    bucketed = emb.withColumn("bucket", _bucket_expr(F.col("embedding"), planes))
    queries = bucketed.filter(_query_filter(every)).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("bucket").alias("q_bucket"),
    )
    n_flips = min(max(probes - 1, 0), nbits)
    probe_buckets = F.array(
        F.col("q_bucket"),
        *[
            F.col("q_bucket").bitwiseXOR(F.lit(1 << j))
            for j in range(n_flips)
        ],
    )
    probed = queries.withColumn("probe_bucket", F.explode(probe_buckets))
    c = F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)
    scored = (
        bucketed.join(
            F.broadcast(probed),
            (F.col("probe_bucket") == F.col("bucket"))
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


def ivf_assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment WITHOUT shuffling the N·C scored
    relation: the argmax is a partial-aggregatable ``max(struct(csim,
    -centroid_id))`` — map-side combine collapses each vector's C scored
    rows to one before the exchange, so the shuffle carries exactly one
    row per vector (vs. the naive ``Window.partitionBy(vec_id)`` which
    moves all N·C rows). Tie-break is deterministic: highest similarity,
    then smallest centroid id (struct comparison is lexicographic)."""
    sim = cosine(F.col("embedding"), F.col("c_emb"))
    return (
        emb.crossJoin(F.broadcast(centroids))
        .select(
            "vec_id",
            "embedding",
            F.struct(
                sim.alias("csim"),
                (-F.col("centroid_id")).alias("neg_id"),
            ).alias("sc"),
        )
        .groupBy("vec_id")
        .agg(
            F.max("sc").alias("best"),
            F.any_value("embedding").alias("embedding"),
        )
        .select("vec_id", "embedding", (-F.col("best.neg_id")).alias("cell"))
    )


def _search_cells(assigned: DataFrame, centroids: DataFrame, k: int,
                  every: int, probes: int) -> DataFrame:
    """Shared IVF search tail: probe the query's P nearest cells (the
    ranking runs only over the tiny query×centroid relation, queries are
    broadcast-sized by construction), then join candidates within those
    cells and rank top-k per query."""
    queries = assigned.filter(_query_filter(every)).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    qsim = cosine(F.col("q_emb"), F.col("c_emb"))
    w_probe = Window.partitionBy("q_id").orderBy(
        F.col("qsim").desc(), F.col("centroid_id")
    )
    probed = (
        queries.crossJoin(F.broadcast(centroids))
        .select("q_id", "q_emb", "centroid_id", qsim.alias("qsim"))
        .withColumn("prank", F.row_number().over(w_probe))
        .filter(F.col("prank") <= probes)
        .select("q_id", "q_emb", F.col("centroid_id").alias("q_cell"))
    )
    c = F.round(cosine(F.col("q_emb"), F.col("embedding")), 6)
    scored = assigned.join(
        F.broadcast(probed),
        (F.col("q_cell") == F.col("cell")) & (F.col("q_id") != F.col("vec_id")),
    ).select("q_id", F.col("vec_id").alias("neighbor_id"), c.alias("cos"))
    w = Window.partitionBy("q_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def ivf_ann_topk(emb: DataFrame, centroid_stride: int = 100, k: int = 5,
                 every: int = 50, probes: int = 1) -> DataFrame:
    """IVF-style ANN: coarse-quantize to the nearest centroid, search
    within the query's cell(s).

    Centroids are a deterministic corpus sample (``vec_id % stride == 1``)
    — the reproducible stand-in for trained k-means centroids
    (:func:`ivf_ann_topk_trained`); swapping in trained centroids changes
    only the centroid relation. Assignment is the narrow-argmax pass
    (:func:`ivf_assign_cells` — one row per vector on the shuffle, no
    Window over the cross-scored relation); the search join then touches
    ~P·N/C candidates per query. ``probes`` > 1 probes the query's P
    nearest cells (multi-probe IVF).
    """
    centroids = emb.filter(F.col("vec_id") % centroid_stride == 1).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("embedding").alias("c_emb"),
    )
    assigned = ivf_assign_cells(emb, centroids)
    return _search_cells(assigned, centroids, k, every, probes)


def kmeans_centroids(emb: DataFrame, k: int = 8, iters: int = 5) -> DataFrame:
    """Trained IVF centroids: Lloyd's k-means over the embedding column,
    pure DataFrame ops per iteration.

    - **assignment** reuses :func:`ivf_assign_cells` — the narrow argmax
      whose shuffle carries one row per vector;
    - **update** recomputes means via ``posexplode → groupBy(cell, pos)
      avg`` — map-side combinable, the shuffle carries k·dim partial
      sums per map task, never vectors;
    - the k·dim centroid matrix is collected per iteration (it is
      broadcast-sized by definition — this is the Spark ML KMeans
      driver-loop shape, not a data-path collect) and re-broadcast.

    Init is the deterministic k-smallest-vec_id sample, so the trained
    result is reproducible run-to-run. Empty cells keep their previous
    centroid. The docstring of :func:`ivf_ann_topk` names this as the
    swap-in for its sampled centroids — swapping changes only the
    centroid relation, nothing downstream."""
    spark = emb.sparkSession
    init = (
        emb.orderBy("vec_id").limit(k)
        .select("embedding").collect()
    )
    cents: list[list[float]] = [
        [float(x) for x in r.embedding] for r in init
    ]
    for _ in range(iters):
        cdf = spark.createDataFrame(
            [(i, c) for i, c in enumerate(cents)],
            "centroid_id int, c_emb array<double>",
        )
        assigned = ivf_assign_cells(emb, cdf)
        means = (
            assigned.select(
                "cell", F.posexplode(_to_double(F.col("embedding"))).alias(
                    "pos", "val"
                )
            )
            .groupBy("cell", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("cell")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("m")))
                ).alias("pm")
            )
            .select(
                "cell",
                F.transform("pm", lambda s: s.getField("m")).alias("c_emb"),
            )
            .collect()  # bounded-driver-collect: ≤ k rows of dim floats
        )
        for r in means:  # empty cells keep their previous centroid
            cents[r.cell] = [float(x) for x in r.c_emb]
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(cents)],
        "centroid_id int, c_emb array<double>",
    )


def ivf_ann_topk_trained(emb: DataFrame, k_cells: int = 8, iters: int = 5,
                         k: int = 5, every: int = 50,
                         probes: int = 1) -> DataFrame:
    """IVF ANN over **trained** k-means centroids (vs the deterministic
    corpus sample :func:`ivf_ann_topk` uses for its oracle gate). Same
    plan shape downstream: narrow argmax assignment, broadcast probe
    ranking, in-cell candidate join (:func:`_search_cells`)."""
    centroids = kmeans_centroids(emb, k=k_cells, iters=iters)
    assigned = ivf_assign_cells(emb, centroids)
    return _search_cells(assigned, centroids, k, every, probes)


def ivf_ann_topk_oracle_sql(centroid_stride: int = 100, k: int = 5,
                            every: int = 50, probes: int = 1) -> str:
    csim = cosine_sql("e.embedding", "c.embedding")
    qsim = cosine_sql("q.embedding", "c.embedding")
    cos = cosine_sql("q.embedding", "e.embedding")
    return f"""
WITH centroids AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % {centroid_stride} = 1
),
assigned AS (
  SELECT vec_id, embedding, cell FROM (
    SELECT e.vec_id, e.embedding, c.vec_id AS cell,
           CAST(row_number() OVER (PARTITION BY e.vec_id
                ORDER BY {csim} DESC, c.vec_id) AS INT) AS arank
    FROM embeddings e CROSS JOIN centroids c
  ) WHERE arank = 1
),
probed AS (
  SELECT q_id, embedding, q_cell FROM (
    SELECT q.vec_id AS q_id, q.embedding, c.vec_id AS q_cell,
           CAST(row_number() OVER (PARTITION BY q.vec_id
                ORDER BY {qsim} DESC, c.vec_id) AS INT) AS prank
    FROM embeddings q CROSS JOIN centroids c
    WHERE q.vec_id % {every} = 0
  ) WHERE prank <= {probes}
),
scored AS (
  SELECT q.q_id, e.vec_id AS neighbor_id, ROUND({cos}, 6) AS cos
  FROM probed q JOIN assigned e
    ON q.q_cell = e.cell AND q.q_id != e.vec_id
)
SELECT q_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def lsh_ann_topk_oracle_sql(nbits: int = 4, dim: int = 64, k: int = 5,
                            every: int = 50, probes: int = 1) -> str:
    if probes > 1:
        return _lsh_multiprobe_oracle_sql(nbits, dim, k, every, probes)
    return _lsh_singleprobe_oracle_sql(nbits, dim, k, every)


def _lsh_bucket_sql(nbits: int, dim: int) -> str:
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
    return " + ".join(proj_terms)


def _lsh_multiprobe_oracle_sql(nbits: int, dim: int, k: int, every: int,
                               probes: int) -> str:
    bucket = _lsh_bucket_sql(nbits, dim)
    n_flips = min(probes - 1, nbits)
    probe_list = ", ".join(
        ["bucket"] + [f"xor(bucket, {1 << j})" for j in range(n_flips)]
    )
    cos = cosine_sql("q.embedding", "e.embedding")
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings
),
probed AS (
  SELECT vec_id, embedding,
         unnest(list_value({probe_list})) AS probe_bucket
  FROM bucketed WHERE vec_id % {every} = 0
),
scored AS (
  SELECT q.vec_id AS q_id, e.vec_id AS neighbor_id,
         ROUND({cos}, 6) AS cos
  FROM probed q JOIN bucketed e
    ON q.probe_bucket = e.bucket AND q.vec_id != e.vec_id
)
SELECT q_id, neighbor_id, cos, rank FROM (
  SELECT *, CAST(row_number() OVER
    (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS INT) AS rank
  FROM scored
) WHERE rank <= {k}
"""


def _lsh_singleprobe_oracle_sql(nbits: int = 4, dim: int = 64, k: int = 5,
                                every: int = 50) -> str:
    bucket = _lsh_bucket_sql(nbits, dim)
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
