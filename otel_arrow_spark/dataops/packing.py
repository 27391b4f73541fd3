"""Training-data assembly: deterministic sampling and sequence packing.

The two operations that sit between a curated corpus and a training
run:

* **sampling** — pick a reproducible subset (global rate or exact
  per-stratum counts) without materializing a random state anywhere;
* **packing** — assign documents to fixed-token-budget context windows
  ("packs"), the step that turns a document table into training
  sequences.

Scale design (100 TB):

* :func:`hash_sample` is a NARROW filter — no shuffle, no RNG state,
  reproducible on any executor count; this is the only sampler that
  survives a 1000-executor cluster unchanged.
* :func:`stratified_sample` shuffles once on the stratum key (exact
  per-stratum counts require grouping); a skewed stratum degrades to
  one fat task, so rate-based :func:`hash_sample` with a per-stratum
  rate map is preferred at scale when counts may be approximate.
* :func:`pack_sequences` salts the corpus into ``n_streams``
  independent streams (narrow hash), then runs ONE window cumsum per
  stream — parallelism is chosen explicitly via ``n_streams``, not
  inherited from the (possibly skewed) data. Boundary semantics are
  contiguous fill: the document that crosses a pack boundary belongs
  to the pack it started in (trainer-side truncation policy decides
  the overflow); an exact greedy closure is a sequential recurrence,
  provided by :func:`pack_sequences_greedy` via ``applyInPandas`` per
  stream for consumers that need it.

All hashes are SHA-256-derived (`hashing.h32`) so a DuckDB oracle
reproduces every decision bit-for-bit.

Reference analog: the reference's pipeline ends at telemetry sinks
(`rust/otap-dataflow/crates/otap/src/parquet_exporter/mod.rs`); corpus
assembly is the LLM-pipeline extension this repo adds as first-class,
per the survey's training-data mandate (SURVEY.md §2, data ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from otel_arrow_spark.dataops.hashing import h32, h32_sql
from otel_arrow_spark.dataops.textstats import TOKEN_RE

_H32_SPACE = 1 << 32


# ---------------------------------------------------------------------------
# deterministic sampling
# ---------------------------------------------------------------------------

def hash_sample(docs: DataFrame, rate: float, key_col: str = "doc_id",
                seed: int | str = 0) -> DataFrame:
    """Keep ~``rate`` of rows, decided purely by a hash of ``key_col``.

    Narrow (no shuffle), independent of partitioning and executor
    count, and stable across runs AND across engines — the property
    random samplers lose the moment the cluster size changes. Keying
    by a business id (not the row) also makes the sample *consistent*:
    every row of a kept conversation/doc is kept together if the key
    is the conversation id.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    thresh = int(rate * _H32_SPACE)
    return docs.filter(
        h32(F.col(key_col).cast("string"), seed) < F.lit(thresh)
    )


def hash_sample_oracle_sql(rate: float, table: str = "documents",
                           key_col: str = "doc_id",
                           seed: int | str = 0) -> str:
    thresh = int(rate * _H32_SPACE)
    return (
        f"SELECT * FROM {table} "
        f"WHERE {h32_sql(f'CAST({key_col} AS VARCHAR)', seed)} < {thresh}"
    )


def stratified_sample(docs: DataFrame, strata_col: str, k: int,
                      key_col: str = "doc_id",
                      seed: int | str = 0) -> DataFrame:
    """Exactly ``min(k, |stratum|)`` rows per stratum, chosen by hash
    rank (deterministic stand-in for per-stratum reservoir sampling).

    One shuffle on the stratum key; ties in the 32-bit hash are broken
    by the key itself so the selection is total-ordered and unique.
    """
    w = Window.partitionBy(strata_col).orderBy(
        h32(F.col(key_col).cast("string"), seed), F.col(key_col)
    )
    return (
        docs.withColumn("_srn", F.row_number().over(w))
        .filter(F.col("_srn") <= k)
        .drop("_srn")
    )


def stratified_sample_oracle_sql(strata_col: str, k: int,
                                 table: str = "documents",
                                 key_col: str = "doc_id",
                                 seed: int | str = 0) -> str:
    h = h32_sql(f"CAST({key_col} AS VARCHAR)", seed)
    return f"""
SELECT * EXCLUDE (_srn) FROM (
  SELECT *, row_number() OVER
    (PARTITION BY {strata_col} ORDER BY {h}, {key_col}) AS _srn
  FROM {table}
) WHERE _srn <= {k}
"""


def token_budget_select(docs: DataFrame, budgets: dict[str, int],
                        token_col: str = "n_chars",
                        strata_col: str = "source",
                        key_col: str = "doc_id",
                        seed: int | str = "budget") -> DataFrame:
    """Per-stratum TOKEN-budget selection — the other half of mixture
    assembly (:func:`mixture_sample` hits target *rates*; this hits
    target token *counts*, the quantity a pre-training recipe is
    actually written in).

    Each stratum's docs are walked in content-hash order (``h32(key)``,
    ties by key — deterministic on any engine/partitioning) and the
    prefix whose cumulative ``token_col`` stays ≤ the stratum's budget
    is kept; strata absent from ``budgets`` are dropped. A stratum
    whose first doc alone exceeds its budget keeps nothing (strict
    rule, documented).

    Scale shape: one window cumsum per stratum. Strata are the mixture
    sources — a bounded, recipe-sized set by contract — so the
    per-stratum sort is the skew ceiling; for a single giant stratum
    swap in the two-phase hash-range rank of
    :func:`training_order` (same order key, bucketed prefix sums).
    """
    if not budgets:
        raise ValueError("token_budget_select: budgets is empty")
    bmap = F.create_map(*[
        F.lit(x) for kv in budgets.items() for x in kv
    ])
    d = docs.filter(
        F.col(strata_col).isin(*budgets.keys()))
    w = Window.partitionBy(strata_col).orderBy(
        h32(F.col(key_col).cast("string"), seed).asc(),
        F.col(key_col).asc())
    cum = F.sum(F.col(token_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        d.withColumn("_cum", cum)
        .filter(F.col("_cum") <= bmap[F.col(strata_col)])
        .drop("_cum")
    )


def token_budget_oracle_sql(budgets: dict[str, int],
                            token_col: str = "n_chars",
                            table: str = "documents",
                            strata_col: str = "source",
                            key_col: str = "doc_id",
                            seed: int | str = "budget") -> str:
    """DuckDB twin of :func:`token_budget_select`."""
    h = h32_sql(f"CAST({key_col} AS VARCHAR)", seed)
    cases = " ".join(
        f"WHEN '{k}' THEN {int(v)}" for k, v in budgets.items())
    keys = ", ".join(f"'{k}'" for k in budgets)
    return f"""
SELECT * EXCLUDE (_cum) FROM (
  SELECT *, SUM({token_col}) OVER (
    PARTITION BY {strata_col} ORDER BY {h}, {key_col}
    ROWS UNBOUNDED PRECEDING) AS _cum
  FROM {table} WHERE {strata_col} IN ({keys}))
WHERE _cum <= CASE {strata_col} {cases} END
"""


def mixture_sample(docs: DataFrame, rates: dict[str, float],
                   strata_col: str = "source", key_col: str = "doc_id",
                   seed: int | str = "mix") -> DataFrame:
    """Domain-mixture resampling to per-stratum target rates — the
    "mixture weights" step of a pre-training data pipeline (sample web
    at 0.3×, upweight code 2×, …).

    ``rate < 1`` downsamples (hash-threshold keep, as
    :func:`hash_sample`); ``rate >= 1`` upsamples: ``floor(rate)``
    copies of every row plus one extra for the hash-selected fractional
    tail, so the expected multiplicity is exactly ``rate`` and the
    realized choice is deterministic per key. Strata absent from
    ``rates`` are dropped (rate 0). Output adds ``copy_idx`` (1-based)
    so downstream shuffles spread the copies.

    Scale shape: narrow — a map-literal lookup, one hash, one
    ``explode(sequence())``; no shuffle, no driver-side state, stable
    under repartitioning (the property a `rand()`-based sampler loses
    whenever the cluster size changes).
    """
    items: list = []
    for k, v in rates.items():
        if v < 0:
            raise ValueError(f"rate for {k!r} must be >= 0, got {v}")
        items += [F.lit(k), F.lit(float(v))]
    r = F.coalesce(
        F.create_map(*items)[F.col(strata_col)], F.lit(0.0)
    )
    u = h32(F.col(key_col).cast("string"), seed) / F.lit(float(_H32_SPACE))
    n_copies = (
        F.floor(r) + (u < (r - F.floor(r))).cast("long")
    ).cast("int")
    return (
        docs.withColumn("_nc", n_copies)
        .filter(F.col("_nc") >= 1)
        .withColumn("copy_idx", F.explode(F.sequence(F.lit(1), F.col("_nc"))))
        .drop("_nc")
    )


def mixture_sample_oracle_sql(rates: dict[str, float],
                              table: str = "documents",
                              strata_col: str = "source",
                              key_col: str = "doc_id",
                              seed: int | str = "mix") -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {float(v)!r}" for k, v in rates.items()
    )
    h = h32_sql(f"CAST({key_col} AS VARCHAR)", seed)
    return f"""
WITH r AS (
  SELECT *, CASE {strata_col} {cases} ELSE 0.0 END AS _r,
         CAST({h} AS DOUBLE) / {float(_H32_SPACE)!r} AS _u
  FROM {table}
), n AS (
  SELECT *, CAST(floor(_r) +
    (CASE WHEN _u < _r - floor(_r) THEN 1 ELSE 0 END) AS INT) AS _nc
  FROM r
)
SELECT * EXCLUDE (_r, _u, _nc),
       CAST(unnest(range(1, _nc + 1)) AS INT) AS copy_idx
FROM n WHERE _nc >= 1
"""


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------

def _with_stream_and_tokens(docs: DataFrame, n_streams: int,
                            text_col: str, key_col: str,
                            seed: int | str) -> DataFrame:
    return docs.select(
        F.col(key_col).alias("doc_id"),
        F.pmod(h32(F.col(key_col).cast("string"), seed),
               F.lit(n_streams)).alias("stream"),
        F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), F.lit(0))
        ).alias("n_tokens"),
    )


def pack_sequences(docs: DataFrame, budget: int, n_streams: int = 8,
                   text_col: str = "text", key_col: str = "doc_id",
                   seed: int | str = 0) -> DataFrame:
    """Contiguous-fill packing: hash-salt docs into ``n_streams``
    streams, order each stream deterministically (hash, id), and cut
    packs at cumulative-token boundaries of ``budget``.

    ``pack_id = floor(exclusive_cumsum(n_tokens) / budget)`` — the doc
    that straddles a boundary stays with the pack it started in, so a
    pack may exceed ``budget`` by at most one document's tail (the
    standard contiguous-fill contract; trainers truncate or roll the
    tail). Returns one row per doc: ``(doc_id, stream, pack_id,
    n_tokens, offset)`` where ``tok_offset`` is the doc's token start
    within its stream.
    """
    if budget <= 0 or n_streams <= 0:
        raise ValueError("budget and n_streams must be positive")
    base = _with_stream_and_tokens(docs, n_streams, text_col, key_col, seed)
    w = (
        Window.partitionBy("stream")
        .orderBy(h32(F.col("doc_id").cast("string"), seed), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.select(
        "doc_id", "stream", "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).alias("tok_offset"),
    ).withColumn(
        "pack_id", (F.col("tok_offset") / F.lit(budget)).cast("bigint")
    )


def pack_sequences_oracle_sql(budget: int, n_streams: int = 8,
                              table: str = "documents",
                              text_col: str = "text",
                              key_col: str = "doc_id",
                              seed: int | str = 0) -> str:
    h = h32_sql(f"CAST({key_col} AS VARCHAR)", seed)
    return f"""
SELECT doc_id, stream, n_tokens, tok_offset,
  CAST(floor(tok_offset / {budget}) AS BIGINT) AS pack_id
FROM (
  SELECT {key_col} AS doc_id,
    ({h}) % {n_streams} AS stream,
    CAST(len(regexp_extract_all({text_col}, '{TOKEN_RE}')) AS INT)
      AS n_tokens,
    CAST(COALESCE(SUM(CAST(len(regexp_extract_all({text_col},
      '{TOKEN_RE}')) AS INT)) OVER (PARTITION BY ({h}) % {n_streams}
      ORDER BY {h}, {key_col}
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      AS tok_offset
  FROM {table}
)
"""


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Per-pack accounting: fill factor is the packing-quality metric
    a pipeline actually monitors."""
    return (
        packed.groupBy("stream", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .withColumn(
            "fill",
            F.round(F.least(F.col("sum_tokens") / F.lit(budget),
                            F.lit(1.0)), 4),
        )
    )


def pack_stats_oracle_sql(budget: int, n_streams: int = 8,
                          table: str = "documents") -> str:
    inner = pack_sequences_oracle_sql(budget, n_streams, table)
    return f"""
SELECT stream, pack_id,
  COUNT(*) AS n_docs,
  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
  round(least(CAST(SUM(n_tokens) AS DOUBLE) / {budget}, 1.0), 4) AS fill
FROM ({inner})
GROUP BY 1, 2
"""


def pack_sequences_greedy(docs: DataFrame, budget: int, n_streams: int = 8,
                          text_col: str = "text", key_col: str = "doc_id",
                          seed: int | str = 0) -> DataFrame:
    """Exact greedy packing (close a pack when the NEXT doc would
    overflow; oversized single docs get a pack of their own).

    The closure rule is a sequential recurrence over each stream, so it
    runs as one ``applyInPandas`` pass per stream — ``n_streams`` is
    the explicit parallelism knob; each group is a few GB at most when
    streams are sized to executors. Same ordering contract as
    :func:`pack_sequences`, so the two agree whenever no document
    straddles a boundary.
    """
    import pandas as pd

    base = _with_stream_and_tokens(
        docs, n_streams, text_col, key_col, seed
    ).withColumn("_h", h32(F.col("doc_id").cast("string"), seed))

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_h", "doc_id"], kind="mergesort")
        pack_ids, fill, cur = [], 0, 0
        for t in pdf["n_tokens"]:
            if fill > 0 and fill + t > budget:
                cur += 1
                fill = 0
            pack_ids.append(cur)
            fill += t
        out = pdf.drop(columns=["_h"])
        out["pack_id"] = pd.Series(pack_ids, index=pdf.index, dtype="int64")
        return out

    schema = "doc_id long, stream long, n_tokens int, pack_id long"
    return base.groupBy("stream").applyInPandas(_pack, schema)


# ---------------------------------------------------------------------------
# context-window chunking
# ---------------------------------------------------------------------------

def chunk_documents(docs: DataFrame, chunk_tokens: int, overlap: int = 0,
                    text_col: str = "text") -> DataFrame:
    """Split each document into fixed-token-budget chunks with optional
    overlap — the long-document counterpart to :func:`pack_sequences`
    (packing concatenates short docs into a window; chunking slices
    long docs to fit one). Stride = ``chunk_tokens - overlap``; the
    final chunk keeps the tail even when shorter than the budget; every
    token lands in ≥1 chunk.

    Entirely NARROW: split → sequence(0, n_chunks-1) → explode →
    slice/array_join, all codegen'd per input partition, no shuffle —
    at 100 TB the chunker adds zero network cost, only output volume
    (× ~(1 + overlap/stride)).
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    w = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(w)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)) / F.lit(stride)), F.lit(1)
    )
    out = docs.select(
        "doc_id", w.alias("_w"),
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int")))
        .alias("chunk_idx"),
    )
    start = (F.col("chunk_idx").cast("bigint") * stride + 1).cast("int")
    piece = F.slice(F.col("_w"), start, F.lit(chunk_tokens))
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(piece).cast("bigint").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def chunk_documents_oracle_sql(chunk_tokens: int, overlap: int = 0,
                               table: str = "documents") -> str:
    stride = chunk_tokens - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
  FROM {table}
)
SELECT doc_id, i AS chunk_idx,
  len(list_slice(w, i * {stride} + 1,
                 least(i * {stride} + {chunk_tokens}, len(w))))
    AS n_tokens,
  array_to_string(list_slice(w, i * {stride} + 1,
                  least(i * {stride} + {chunk_tokens}, len(w))), ' ')
    AS chunk_text
FROM toks,
  UNNEST(range(greatest(CAST(ceil((len(w) - {overlap})
        / CAST({stride} AS DOUBLE)) AS BIGINT), 1))) AS t(i)
"""


# ---------------------------------------------------------------------------
# deterministic corpus shuffle (training order)
# ---------------------------------------------------------------------------

def training_order(docs: DataFrame, id_col: str = "doc_id",
                   salt: str = "epoch0", buckets: int = 1024) -> DataFrame:
    """Assign every document a deterministic pseudo-random global
    position — the corpus shuffle a training run performs before
    sharding, reproducible on any cluster size and re-derivable per
    epoch by changing ``salt``.

    Never a single-partition global window: the shuffle key is
    :func:`~otel_arrow_spark.dataops.hashing.h32` (uniform on
    [0, 2^32)), so contiguous RANGES of the hash domain preserve global
    key order across buckets — the two-phase trick of
    ``ordering.salted_window_rank``, globalized. Phase 1 ranks inside
    each of ``buckets`` hash-range buckets (≈N/buckets rows per window
    partition, uniform by construction — no skew possible); phase 2
    computes per-bucket base offsets over the tiny bucket-count
    relation and broadcast-joins them back. position = base +
    within-bucket rank, identical to
    ``ROW_NUMBER() OVER (ORDER BY key, id)``.
    """
    from pyspark.sql import Window

    from otel_arrow_spark.dataops.hashing import h32

    span = (1 << 32) // buckets
    key = h32(F.concat(F.lit(salt), F.lit("|"),
                       F.col(id_col).cast("string")))
    bucketed = docs.select(
        id_col, key.alias("_key"), (key / span).cast("long").alias("_b"),
    )
    w1 = Window.partitionBy("_b").orderBy("_key", id_col)
    ranked = bucketed.withColumn("_r", F.row_number().over(w1))
    sizes = bucketed.groupBy("_b").agg(F.count(F.lit(1)).alias("_n"))
    w2 = Window.orderBy("_b")  # one row per bucket: tiny by contract
    offsets = sizes.withColumn(
        "_base", F.coalesce(F.sum("_n").over(w2) - F.col("_n"), F.lit(0))
    ).select("_b", "_base")
    return (
        ranked.join(F.broadcast(offsets), "_b", "left")
        .select(
            id_col,
            (F.col("_base") + F.col("_r")).cast("bigint").alias("position"),
        )
    )


def training_order_oracle_sql(table: str = "documents",
                              id_col: str = "doc_id",
                              salt: str = "epoch0") -> str:
    from otel_arrow_spark.dataops.hashing import h32_sql

    key = h32_sql(f"('{salt}' || '|' || CAST({id_col} AS VARCHAR))")
    return f"""
SELECT {id_col},
  ROW_NUMBER() OVER (ORDER BY {key}, {id_col}) AS position
FROM {table}
"""
