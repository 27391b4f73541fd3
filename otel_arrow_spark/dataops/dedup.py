"""Deduplication operators for corpus curation at 100 TB scale.

Five families, all shuffle-disciplined:

- **exact**: one hash-groupBy on ``sha2(text)`` — map-side partial agg,
  single shuffle on the 32-byte digest (uniform keys, no skew).
- **MinHash + LSH**: per-row narrow signature computation, then ONE
  shuffle on ``(band_id, band_key)`` for the bucket self-join; candidate
  verification recomputes shingle sets on the (tiny) candidate set only.
- **n-gram Jaccard**: blocked all-pairs for small blocks — the exact
  verifier; LSH is the scale path that feeds it candidates.
- **SimHash**: per-row narrow bit-vector fold (no shuffle at all), then
  byte-banded candidate join + exact Hamming filter.
- **embedding near-dup**: label-blocked pairwise cosine; the ANN module
  (`similarity.py`) is the scale path.

Reference analog: content-hash dedup of resources/scopes before encoding
(`go/pkg/otel/logs/arrow/optimizer.go:63-106`); everything beyond exact
hashing is the training-data-pipeline extension.

Every public operator has a ``*_oracle_sql`` twin generating the DuckDB
SQL the driver's gate runs side-by-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from otel_arrow_spark.dataops.hashing import (
    h32, h32_sql, hashed_shingles, hashed_shingles_sql, minhash_value,
    minhash_value_sql, shingles, shingles_sql, words_of,
)

# ---------------------------------------------------------------------------
# cache registry: the banded/signature relations are persisted because the
# self-join + verify branches would re-evaluate the whole SHA subtree per
# branch (no CSE across self-joins). These operators return LAZY DataFrames,
# so the persist cannot be released inside the operator — callers release
# after the consuming action via release_caches() (check_entry/bench do this
# between queries; long-lived sessions should too, or executor storage
# memory accumulates one entry per invocation).
# ---------------------------------------------------------------------------

_PERSISTED: list[DataFrame] = []


def _persist(df: DataFrame) -> DataFrame:
    df = df.persist()
    _PERSISTED.append(df)
    return df


def persist_registered(df: DataFrame) -> DataFrame:
    """Public registration point for OPERATOR-scoped persists (e.g. the
    KQL basket/diffpatterns leg loops) so they share release_caches()'s
    lifecycle with the dedup relations."""
    return _persist(df)


def release_caches() -> int:
    """Unpersist every relation cached by dedup operators since the last
    release; returns how many were released. Safe to call any time after
    the consuming action (lazy consumers materialize the plan without the
    cache, still correctly)."""
    n = len(_PERSISTED)
    while _PERSISTED:
        _PERSISTED.pop().unpersist()
    return n

# ---------------------------------------------------------------------------
# deterministic dup-injected corpus (both engines derive it identically, so
# dedup outputs are non-trivial on the synthetic documents table)
# ---------------------------------------------------------------------------

DUP_CORPUS_SQL = r"""
SELECT doc_id, text, lang, source FROM documents
UNION ALL
SELECT doc_id + 1000000, regexp_replace(text, '^\S+ \S+ ', ''), lang, source
FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT doc_id + 2000000, text, lang, source
FROM documents WHERE doc_id % 10 = 0
"""


def dup_corpus(docs: DataFrame) -> DataFrame:
    """documents ∪ near-dups (first two words dropped) ∪ exact dups."""
    base = docs.select("doc_id", "text", "lang", "source")
    near = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.regexp_replace("text", r"^\S+ \S+ ", "").alias("text"),
        "lang", "source",
    )
    exact = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 2000000).alias("doc_id"), "text", "lang", "source"
    )
    return base.unionByName(near).unionByName(exact)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Duplicate groups by content hash: (text_sha, canonical_id, n_copies).

    Single shuffle on the digest; partial aggregation map-side. At 100 TB
    the digest is computed in the scan stage and the shuffle carries only
    (digest, doc_id) — no text bytes move.
    """
    return (
        docs.groupBy(F.sha2(F.col(text_col), 256).alias("text_sha"))
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


def exact_dup_groups_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL) -> str:
    return f"""
WITH corpus AS ({corpus_sql})
SELECT sha256(text) AS text_sha, min(doc_id) AS canonical_id,
       count(*) AS n_copies
FROM corpus GROUP BY 1 HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# MinHash signatures + LSH candidate pairs
# ---------------------------------------------------------------------------

def _with_sig(docs: DataFrame, k: int, n: int, text_col: str,
              keep_shingles: bool = False) -> DataFrame:
    """(doc_id[, sh], sig): SHA once per shingle (materialized column),
    k affine minhash coordinates over it. Narrow; nothing shuffles."""
    sh = shingles(words_of(F.col(text_col)), n)
    base = docs.select("doc_id", sh.alias("sh"))
    hashed = base.select(
        "doc_id", "sh", hashed_shingles(F.col("sh")).alias("hs")
    )
    sig = F.array(*[minhash_value(F.col("hs"), s) for s in range(k)])
    keep = ["doc_id"] + (["sh"] if keep_shingles else [])
    return hashed.select(*keep, sig.alias("sig"))


def minhash_signatures(docs: DataFrame, k: int = 8, n: int = 3,
                       text_col: str = "text") -> DataFrame:
    """(doc_id, seed, minhash): k min-hash coordinates per doc.

    Narrow (per-row) computation — one SHA pass over the shingle set,
    then k cheap affine mixes. The signature relation is persisted
    before the explode: Generate re-evaluates its generator expression
    per emitted row (k× the full SHA subtree, measured 8×), while the
    persisted array explodes for free.
    """
    sigs = _persist(_with_sig(docs, k, n, text_col))
    return sigs.select(
        "doc_id", F.posexplode(F.col("sig")).alias("seed", "minhash")
    )


def minhash_signatures_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL,
                                  k: int = 8, n: int = 3) -> str:
    cols = ", ".join(
        minhash_value_sql("hs", s) + f" AS mh_{s}" for s in range(k)
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, {s} AS seed, mh_{s} AS minhash FROM sigs"
        for s in range(k)
    )
    return f"""
WITH corpus AS ({corpus_sql}),
hashed AS (
  SELECT doc_id, {hashed_shingles_sql(shingles_sql('w', n))} AS hs
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
),
sigs AS (SELECT doc_id, {cols} FROM hashed)
{unions}
"""


def _band_keys(sig: Column, k: int, bands: int) -> Column:
    """Array of per-band keys: hash of the band's signature slice."""
    r = k // bands
    return F.array(
        *[
            h32(
                F.concat_ws(",", *[
                    F.element_at(sig, b * r + j + 1).cast("string")
                    for j in range(r)
                ]),
                f"band{b}",
            )
            for b in range(bands)
        ]
    )


# Skew guard for banded self-joins: one hot (band_id, band_key) bucket —
# e.g. millions of near-empty documents sharing a signature at corpus
# scale — would otherwise produce quadratic candidate pairs inside a
# single join task. Buckets above the cap are DROPPED (their members are
# still caught by exact dedup — identical/near-empty docs hash equal),
# and :func:`oversized_buckets` reports what a given cap would drop.
DEFAULT_MAX_BUCKET = 4096


def _cap_buckets(banded: DataFrame, keys: list[str],
                 max_bucket: int | None) -> DataFrame:
    """Drop rows whose bucket exceeds ``max_bucket`` members.

    Implemented as a broadcast ANTI-join against only the *oversized*
    bucket keys: a bucket needs > max_bucket members to qualify, so
    there are at most N/max_bucket of them (usually zero) — always
    broadcast-sized. The banded relation itself never shuffles for the
    cap; the one aggregate that counts buckets collapses map-side to
    one row per bucket.
    """
    if max_bucket is None:
        return banded
    # persist: the hot-bucket count is an unavoidable extra pass over the
    # banded relation (broadcast sides materialize before the join);
    # caching it lets the count job and both self-join sides share one
    # materialization. Measured at sf0.1: cap costs ~2.2× uncached,
    # ~1.9× with the cache — a fixed extra narrow pass that buys
    # immunity from quadratic hot-bucket blowups (BENCH notes).
    banded = _persist(banded)
    hot = (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_bucket_n"))
        .filter(F.col("_bucket_n") > max_bucket)
        .select(*keys)
    )
    return banded.join(F.broadcast(hot), keys, "left_anti")


def oversized_buckets(banded: DataFrame, keys: list[str],
                      max_bucket: int) -> DataFrame:
    """Audit relation: the buckets a cap would drop, with member counts.
    Callers log/persist this next to the dedup output (the reference
    discipline: dropped work is always counted, `signal_type_router.rs:43-128`)."""
    return (
        banded.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket)
    )


def minhash_lsh_pairs(docs: DataFrame, k: int = 8, bands: int = 4,
                      n: int = 3, tau: float = 0.5,
                      text_col: str = "text",
                      max_bucket: int | None = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Near-dup pairs via banded MinHash-LSH + exact Jaccard verify.

    Plan shape (the part that must survive 1000 executors):
      1. narrow: signature + band keys per row;
      2. bucket-size cap: drop hot buckets > ``max_bucket`` (skew guard —
         a degenerate bucket would otherwise go quadratic in one task);
      3. ONE shuffle on (band_id, band_key) via the self-join;
      4. distinct candidate pairs (tiny);
      5. verify: re-join the corpus twice to recompute shingle sets for
         candidates only, exact Jaccard, filter ≥ tau.
    """
    # Signature+shingles computed ONCE and persisted: the banded
    # self-join and the verify joins would otherwise re-evaluate the
    # whole SHA subtree on every side (Spark has no automatic CSE across
    # self-join branches). At cluster scale this is a deliberate
    # materialization of the (small) signature relation.
    sigs = _persist(_with_sig(docs, k, n, text_col, keep_shingles=True))
    banded = sigs.select(
        "doc_id", F.posexplode(_band_keys(F.col("sig"), k, bands)).alias(
            "band_id", "band_key"
        )
    )
    banded = _cap_buckets(banded, ["band_id", "band_key"], max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sets = sigs.select("doc_id", "sh")
    j = _jaccard(F.col("sa.sh"), F.col("sb.sh"))
    return (
        cands.join(sets.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(sets.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
    )


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter / F.greatest(union, F.lit(1))


def minhash_lsh_pairs_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL,
                                 k: int = 8, bands: int = 4, n: int = 3,
                                 tau: float = 0.5,
                                 max_bucket: int = DEFAULT_MAX_BUCKET) -> str:
    r = k // bands
    band_rows = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {h} AS band_key FROM sigs".format(
            b=b,
            h=h32_sql(
                "concat_ws(',', "
                + ", ".join(f"mh_{b * r + j}::VARCHAR" for j in range(r))
                + ")",
                f"band{b}",
            ),
        )
        for b in range(bands)
    )
    cols = ", ".join(
        minhash_value_sql("hs", s) + f" AS mh_{s}" for s in range(k)
    )
    return f"""
WITH corpus AS ({corpus_sql}),
hashed AS (
  SELECT doc_id, w, {hashed_shingles_sql(shingles_sql('w', n))} AS hs
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus)
),
sigs AS (SELECT doc_id, w, {cols} FROM hashed),
banded_all AS ({band_rows}),
banded AS (
  SELECT doc_id, band_id, band_key FROM banded_all
  QUALIFY count(*) OVER (PARTITION BY band_id, band_key) <= {max_bucket}
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
   AND a.doc_id < b.doc_id
),
sets AS (SELECT doc_id, {shingles_sql('w', n)} AS sh
         FROM (SELECT doc_id, string_split(text, ' ') AS w FROM corpus))
SELECT doc_a, doc_b,
  ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
        greatest(len(list_distinct(sa.sh || sb.sh)), 1), 6) AS jaccard
FROM cands
JOIN sets sa ON cands.doc_a = sa.doc_id
JOIN sets sb ON cands.doc_b = sb.doc_id
WHERE ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE /
            greatest(len(list_distinct(sa.sh || sb.sh)), 1), 6) >= {tau}
"""


# ---------------------------------------------------------------------------
# blocked n-gram Jaccard (exact verifier / small-block path)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(docs: DataFrame, n: int = 3, tau: float = 0.5,
                        block_cols: tuple[str, ...] = ("lang", "source"),
                        text_col: str = "text") -> DataFrame:
    """All-pairs Jaccard within blocks (same lang+source by default).

    Quadratic per block — correct only when blocks are bounded; at scale
    LSH generates the candidates instead. Block keys shuffle once.
    """
    sh = shingles(words_of(F.col(text_col)), n)
    sets = docs.select("doc_id", *block_cols, sh.alias("sh"))
    a, b = sets.alias("a"), sets.alias("b")
    cond = F.col("a.doc_id") < F.col("b.doc_id")
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    j = _jaccard(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(j, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= tau)
    )


def ngram_jaccard_pairs_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL,
                                   n: int = 3, tau: float = 0.5) -> str:
    return f"""
WITH corpus AS ({corpus_sql}),
sets AS (SELECT doc_id, lang, source, {shingles_sql('w', n)} AS sh
         FROM (SELECT doc_id, lang, source, string_split(text, ' ') AS w
               FROM corpus))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE /
        greatest(len(list_distinct(a.sh || b.sh)), 1), 6) AS jaccard
FROM sets a JOIN sets b
  ON a.doc_id < b.doc_id AND a.lang = b.lang AND a.source = b.source
WHERE ROUND(len(list_intersect(a.sh, b.sh))::DOUBLE /
            greatest(len(list_distinct(a.sh || b.sh)), 1), 6) >= {tau}
"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash(docs: DataFrame, text_col: str = "text",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash: frequency-weighted bitwise majority of word hashes.

    Fully narrow — the per-word hash and the per-bit vote fold run inside
    codegen on each row; no explode, no shuffle.
    """
    w = words_of(F.col(text_col))
    hashed = F.transform(w, lambda x: h32(x))
    zero = F.array_repeat(F.lit(0).cast("bigint"), bits)
    votes = F.aggregate(
        hashed,
        zero,
        lambda acc, h: F.zip_with(
            acc,
            # bit positions unrolled statically: shift amounts must be
            # literals, and unrolling keeps the whole fold in codegen
            F.array(*[
                F.shiftright(h, b).bitwiseAND(F.lit(1)).cast("bigint") * 2 - 1
                for b in range(bits)
            ]),
            lambda x, y: x + y,
        ),
    )
    with_votes = docs.select("doc_id", votes.alias("votes"))
    sim = sum(
        (
            F.when(
                F.element_at(F.col("votes"), b + 1) > 0,
                F.lit(1 << b).cast("bigint"),
            ).otherwise(F.lit(0).cast("bigint"))
            for b in range(bits)
        ),
        start=F.lit(0).cast("bigint"),
    )
    return with_votes.select("doc_id", sim.alias("simhash"))


def simhash_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL,
                       bits: int = SIMHASH_BITS) -> str:
    # independent formulation: per-bit vote via list_sum over word hashes
    vote = ", ".join(
        f"list_sum(list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)) AS v{b}"
        for b in range(bits)
    )
    sim = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b}::BIGINT ELSE 0 END)"
        for b in range(bits)
    )
    return f"""
WITH corpus AS ({corpus_sql}),
hashed AS (
  SELECT doc_id,
         list_transform(string_split(text, ' '), s -> {h32_sql('s')}) AS hs
  FROM corpus
),
votes AS (SELECT doc_id, {vote} FROM hashed)
SELECT doc_id, {sim} AS simhash FROM votes
"""


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  bits: int = SIMHASH_BITS,
                  text_col: str = "text",
                  max_bucket: int | None = DEFAULT_MAX_BUCKET) -> DataFrame:
    """Near-dup pairs by SimHash: byte-banded candidates + Hamming filter.

    Pigeonhole banding on the 4 bytes of the 32-bit hash: a pair within
    Hamming ≤ 3 must share at least one byte exactly, so ``max_hamming``
    defaults to 3 — the recall bound the 4-band scheme actually
    guarantees. Raising ``max_hamming`` above bits/bands - 1 silently
    under-reports (pairs whose differing bits spread across every band
    never become candidates); pass more/narrower bands instead if a
    looser threshold with full recall is needed. One shuffle on
    (byte_idx, byte_val).
    """
    if max_hamming >= bits // 8:
        raise ValueError(
            f"max_hamming={max_hamming} exceeds the recall guarantee of "
            f"{bits // 8}-byte banding (bands-1 = {bits // 8 - 1}); "
            "use a smaller threshold or narrower bands"
        )
    sims = simhash(docs, text_col, bits)
    nbytes = bits // 8
    banded = sims.select(
        "doc_id", "simhash",
        F.posexplode(
            F.array(*[
                F.shiftright(F.col("simhash"), 8 * i).bitwiseAND(F.lit(255))
                for i in range(nbytes)
            ])
        ).alias("byte_idx", "byte_val"),
    )
    # hot-bucket cap (same guard as minhash_lsh_pairs: one degenerate
    # (byte_idx, byte_val) bucket would go quadratic in one join task)
    banded = _cap_buckets(banded, ["byte_idx", "byte_val"], max_bucket)
    a, b = banded.alias("a"), banded.alias("b")
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.byte_idx") == F.col("b.byte_idx"))
            & (F.col("a.byte_val") == F.col("b.byte_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL,
                             max_hamming: int = 3,
                             bits: int = SIMHASH_BITS,
                             max_bucket: int = DEFAULT_MAX_BUCKET) -> str:
    base = simhash_oracle_sql(corpus_sql, bits)
    nbytes = bits // 8
    bands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {i} AS byte_idx, "
        f"(simhash >> {8 * i}) & 255 AS byte_val FROM sims"
        for i in range(nbytes)
    )
    return f"""
WITH sims AS ({base}),
banded_all AS ({bands}),
banded AS (
  SELECT doc_id, simhash, byte_idx, byte_val FROM banded_all
  QUALIFY count(*) OVER (PARTITION BY byte_idx, byte_val) <= {max_bucket}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM banded a JOIN banded b
  ON a.byte_idx = b.byte_idx AND a.byte_val = b.byte_val
 AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------

def _to_double(a: Column) -> Column:
    return F.transform(a, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _to_double(a), _to_double(b)
    return dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b))


COSINE_SQL = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(list_zip({a}, {b}), p -> p[1]::DOUBLE * p[2]::DOUBLE)), "
    "(x, y) -> x + y)"
)


def cosine_sql(a: str, b: str) -> str:
    d = COSINE_SQL.format(a=a, b=b)
    na = COSINE_SQL.format(a=a, b=a)
    nb = COSINE_SQL.format(a=b, b=b)
    return f"({d} / sqrt({na}) / sqrt({nb}))"


def embedding_neardup_pairs(emb: DataFrame, tau: float = 0.4,
                            block_col: str | None = "label") -> DataFrame:
    """Pairs of embeddings with cosine ≥ tau, blocked to bound the join.

    Blocking on `label` keeps the pairwise term linear in block size; at
    100 TB the ANN path (`similarity.lsh_ann_topk`) generates candidates
    instead of blocking.
    """
    cols = ["vec_id", "embedding"] + ([block_col] if block_col else [])
    e = emb.select(*cols)
    a, b = e.alias("a"), e.alias("b")
    cond = F.col("a.vec_id") < F.col("b.vec_id")
    if block_col:
        cond = cond & (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
    c = F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 6)
    return (
        a.join(b, cond)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            c.alias("cos"),
        )
        .filter(F.col("cos") >= tau)
    )


def embedding_neardup_pairs_oracle_sql(tau: float = 0.4,
                                       block_col: str | None = "label") -> str:
    cos = cosine_sql("a.embedding", "b.embedding")
    block = f"AND a.{block_col} = b.{block_col}" if block_col else ""
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND({cos}, 6) AS cos
FROM embeddings a JOIN embeddings b
  ON a.vec_id < b.vec_id {block}
WHERE ROUND({cos}, 6) >= {tau}
"""


def connected_components(pairs: DataFrame, universe: DataFrame,
                         max_iter: int = 25) -> DataFrame:
    """Cluster ids over an undirected pair graph: every node's cluster
    is the MINIMUM node id reachable from it (deterministic canonical
    label — the near-dup analog of the reference's content-dedup
    `dense_rank` ids, `signals.py:280` pattern).

    Min-label propagation, pure DataFrame iterations: each round every
    node takes ``min(own label, min(neighbor labels))`` — one equi-join
    + one map-side-combinable min aggregate per round — and stops when a
    round changes nothing. Converges in O(graph diameter) rounds; LSH
    near-dup components are short chains in practice (``max_iter`` is a
    safety bound, not the expected count). Each round's frontier is
    ``localCheckpoint``-ed: the iteration result is materialized and its
    lineage CUT, so round N+1's plan does not replay rounds 1..N (at
    cluster scale swap in a reliable ``checkpoint`` dir). The per-round
    convergence check is a 1-row count action — the bounded driver-loop
    shape of :func:`~otel_arrow_spark.dataops.similarity.kmeans_centroids`,
    never data-sized. For graphs with giant components / adversarial
    diameter, the alternating large-star/small-star variant (O(log n)
    rounds) is the drop-in upgrade; same per-round plan shape.

    ``universe`` (one ``doc_id`` column) supplies the full node set:
    docs in no pair become singleton clusters of themselves.
    """
    edges = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("lbl", F.col("doc_id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges["dst"] == labels["doc_id"])
            .groupBy("src")
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(neigh, labels["doc_id"] == neigh["src"], "left")
            .select(
                labels["doc_id"],
                F.least(
                    labels["lbl"], F.coalesce("nbr_lbl", labels["lbl"])
                ).alias("lbl"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # Exhausting max_iter with changed > 0 means the labels are NOT
        # a fixed point — silently returning them would let downstream
        # curation keep transitive near-dups. Fail loudly; callers on
        # adversarial-diameter graphs should raise max_iter or move to
        # the large-star/small-star variant.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(last round changed {changed} labels); raise max_iter or "
            "use an O(log n) star-contraction variant for this graph"
        )
    return (
        universe.select("doc_id")
        .join(labels.withColumnRenamed("lbl", "cluster_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )


def connected_components_star(pairs: DataFrame, universe: DataFrame,
                              max_iter: int = 40) -> DataFrame:
    """Connected components by alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — the O(log n)-round variant for graphs whose
    diameter makes :func:`connected_components`' O(diameter) min-label
    propagation slow (long chains, adversarial inputs). Same contract:
    ``(doc_id, cluster_id)`` with cluster = MIN node id of the
    component, singletons labeled themselves.

    Each round is two edge rewrites, each ONE groupBy-min + ONE
    equi-join over the current edge set:

    * large-star: every node u computes ``m = min(Γ(u) ∪ {u})`` and
      re-points its strictly larger neighbors at m;
    * small-star: over larger→smaller canonical edges, every node u
      re-points its ≤-neighbors (and itself) at the local min.

    Rounds localCheckpoint like the min-label loop (lineage cut, so
    round N+1 does not replay 1..N); the convergence probe is one
    bounded count per round (edge-set fixpoint), and the result is a
    forest of depth-1 stars rooted at component minima.
    """
    e = (
        pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
        .filter(F.col("u").isNotNull() & F.col("v").isNotNull()
                & (F.col("u") != F.col("v")))
        .distinct()
        .localCheckpoint()
    )

    def _bidir(edges: DataFrame) -> DataFrame:
        return edges.unionByName(edges.select(
            F.col("v").alias("u"), F.col("u").alias("v")))

    for _ in range(max_iter):
        # large-star over the bidirected neighborhood
        bd = _bidir(e)
        mins = bd.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m"))
        large = (
            bd.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        # small-star over larger→smaller canonical edges
        canon = large.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        ).filter(F.col("u") != F.col("v")).distinct()
        smins = canon.groupBy("u").agg(
            F.least(F.first("u"), F.min("v")).alias("m"))
        small = (
            canon.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(smins.select(
                F.col("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # fixpoint when the edge set is unchanged (symmetric difference
        # empty) — two bounded anti-join counts
        grew = small.exceptAll(e).limit(1).count()
        shrank = e.exceptAll(small).limit(1).count()
        e = small
        if grew == 0 and shrank == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter} "
            "rounds — not expected for any graph (O(log n) bound); "
            "check the input for pathological duplication"
        )
    labels = e.groupBy("u").agg(F.min("v").alias("lbl")).select(
        F.col("u").alias("doc_id"), "lbl")
    return (
        universe.select("doc_id")
        .join(labels.withColumnRenamed("lbl", "cluster_id"),
              "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
    )


def neardup_clusters(docs: DataFrame, tau: float = 0.5,
                     max_iter: int = 25, **lsh_kw) -> DataFrame:
    """Near-dup CLUSTER assignment: MinHash-LSH candidate pairs
    (:func:`minhash_lsh_pairs`, hot-bucket-capped) → connected
    components → ``(doc_id, cluster_id)`` for the whole corpus
    (singletons = own id). The step after pair-finding that a real
    curation pipeline needs: pick one canonical doc per cluster rather
    than greedily dropping pair-members."""
    pairs = minhash_lsh_pairs(docs, tau=tau, **lsh_kw).select(
        "doc_a", "doc_b"
    )
    return connected_components(pairs, docs.select("doc_id"), max_iter)


def neardup_clusters_oracle_sql(corpus_sql: str = DUP_CORPUS_SQL,
                                tau: float = 0.5) -> str:
    """DuckDB twin: recursive transitive closure over the same pair
    relation; cluster = min reachable node (LEAST with self)."""
    pairs_sql = minhash_lsh_pairs_oracle_sql(corpus_sql, tau=tau)
    return f"""
WITH RECURSIVE
pairs AS (SELECT doc_a, doc_b FROM ({pairs_sql})),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION SELECT doc_b, doc_a FROM pairs
),
reach(a, b) AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
corpus2 AS ({corpus_sql})
SELECT d.doc_id,
  CAST(LEAST(d.doc_id, COALESCE(MIN(r.b), d.doc_id)) AS BIGINT)
    AS cluster_id
FROM corpus2 d LEFT JOIN reach r ON r.a = d.doc_id
GROUP BY d.doc_id
"""


# ---------------------------------------------------------------------------
# cross-corpus (incremental) near-dup: new batch vs existing corpus
# ---------------------------------------------------------------------------

def cross_corpus_neardup(new: DataFrame, corpus: DataFrame,
                         k: int = 8, bands: int = 4, n: int = 3,
                         tau: float = 0.5, text_col: str = "text",
                         max_bucket: int | None = DEFAULT_MAX_BUCKET,
                         ) -> DataFrame:
    """Near-dup pairs between an incoming batch and an EXISTING corpus —
    the continual-ingest dedup (new crawl vs what's already in the
    training set). Same banded MinHash-LSH shape as
    :func:`minhash_lsh_pairs` but a two-relation join, which scales
    differently — and better — than the self-join:

    - band keys are narrow per-row computations on each side; the only
      shuffle co-partitions both sides on (band_id, band_key);
    - the bucket cap applies to the CORPUS side (that's where a
      degenerate bucket lives at 100 TB; a capped corpus bucket drops
      candidate generation, not corpus rows);
    - candidate verification recomputes shingle sets for the candidate
      doc ids only, one join per side.

    Returns (new_id, corpus_id, jaccard ≥ tau). Typical use drops or
    down-weights flagged new docs before appending to the corpus.
    """
    ns = _persist(_with_sig(new, k, n, text_col, keep_shingles=True))
    cs = _persist(_with_sig(corpus, k, n, text_col, keep_shingles=True))

    def banded(sigs: DataFrame) -> DataFrame:
        return sigs.select(
            "doc_id",
            F.posexplode(_band_keys(F.col("sig"), k, bands)).alias(
                "band_id", "band_key"
            ),
        )

    nb = banded(ns)
    cb = _cap_buckets(banded(cs), ["band_id", "band_key"], max_bucket)
    cands = (
        nb.alias("a")
        .join(
            cb.alias("b"),
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .select(
            F.col("a.doc_id").alias("new_id"),
            F.col("b.doc_id").alias("corpus_id"),
        )
        .distinct()
    )
    j = _jaccard(F.col("sa.sh"), F.col("sb.sh"))
    return (
        cands.join(ns.alias("sa"), F.col("new_id") == F.col("sa.doc_id"))
        .join(cs.alias("sb"), F.col("corpus_id") == F.col("sb.doc_id"))
        .select("new_id", "corpus_id", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= tau)
    )


def cross_corpus_neardup_oracle_sql(new_sql: str, corpus_sql: str,
                                    k: int = 8, bands: int = 4, n: int = 3,
                                    tau: float = 0.5,
                                    max_bucket: int = DEFAULT_MAX_BUCKET,
                                    ) -> str:
    r = k // bands
    cols = ", ".join(
        minhash_value_sql("hs", s) + f" AS mh_{s}" for s in range(k)
    )

    def side(name: str, src: str) -> str:
        band_rows = " UNION ALL ".join(
            "SELECT doc_id, {b} AS band_id, {h} AS band_key"
            " FROM {name}_sigs".format(
                b=b, name=name,
                h=h32_sql(
                    "concat_ws(',', "
                    + ", ".join(f"mh_{b * r + j}::VARCHAR" for j in range(r))
                    + ")",
                    f"band{b}",
                ),
            )
            for b in range(bands)
        )
        return f"""
{name}_src AS ({src}),
{name}_hashed AS (
  SELECT doc_id, w, {hashed_shingles_sql(shingles_sql('w', n))} AS hs
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM {name}_src)
),
{name}_sigs AS (SELECT doc_id, w, {cols} FROM {name}_hashed),
{name}_banded_all AS ({band_rows}),
{name}_sets AS (SELECT doc_id, {shingles_sql('w', n)} AS sh
                FROM (SELECT doc_id, string_split(text, ' ') AS w
                      FROM {name}_src))"""

    jac = ("ROUND(len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
           "greatest(len(list_distinct(sa.sh || sb.sh)), 1), 6)")
    return f"""
WITH {side('newb', new_sql)},
{side('corp', corpus_sql)},
corp_banded AS (
  SELECT doc_id, band_id, band_key FROM corp_banded_all
  QUALIFY count(*) OVER (PARTITION BY band_id, band_key) <= {max_bucket}
),
cands AS (
  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS corpus_id
  FROM newb_banded_all a JOIN corp_banded b
    ON a.band_id = b.band_id AND a.band_key = b.band_key
)
SELECT new_id, corpus_id, {jac} AS jaccard
FROM cands
JOIN newb_sets sa ON cands.new_id = sa.doc_id
JOIN corp_sets sb ON cands.corpus_id = sb.doc_id
WHERE {jac} >= {tau}
"""


# ---------------------------------------------------------------------------
# exact-substring duplicate spans (the "repeated n-gram" dedup of
# Lee et al., "Deduplicating Training Data Makes Language Models
# Better" — the n-gram-fingerprint approximation of the suffix-array
# method, which is the form that distributes)
# ---------------------------------------------------------------------------


def duplicate_ngram_spans(
    docs: DataFrame, n: int = 8, min_count: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-document duplicated-substring report: every length-``n``
    token window whose exact text occurs ≥ ``min_count`` times anywhere
    in the corpus (within- OR cross-document — repeated boilerplate
    counts, per the paper), reduced per document to the duplicated
    window count, the UNION token coverage of those windows, and the
    coverage ratio.

    100 TB shape: the window explode is linear (one output row per
    token, not per pair); counting shuffles once on the gram key with
    map-side partial aggregation; flagged grams join back with one more
    equi-join shuffle (AQE's skew split covers hot boilerplate grams).
    Coverage is an interval union computed with a single ``lead()``
    window partitioned by doc — Σ min(next_start − start, n) over the
    doc's flagged windows, never a second explode. This gate keys on
    the gram TEXT so the DuckDB twin is hash-free; at scale, key on
    ``xxhash64(gram)`` instead so shuffle rows carry 8 bytes, with an
    identical plan shape (the digest-key discipline of
    ``exact_dup_groups``).
    """
    from pyspark.sql import Window as W

    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    ).withColumn("nt", F.size("w"))
    # sequence(0, nt-n) would count DOWN for nt < n — gate it
    grams = F.when(
        F.col("nt") >= n,
        F.transform(
            F.sequence(F.lit(0), F.col("nt") - n),
            lambda i: F.concat_ws(" ", F.slice(F.col("w"), i + 1, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    wins = t.select(
        "doc_id", "nt", F.posexplode(grams).alias("pos", "gram")
    )
    flagged = (
        wins.groupBy("gram")
        .agg(F.count("*").alias("n_occ"))
        .filter(F.col("n_occ") >= min_count)
        .select("gram")
    )
    j = wins.join(flagged, "gram")
    nxt = F.lead("pos").over(W.partitionBy("doc_id").orderBy("pos"))
    covered = F.least(F.coalesce(nxt - F.col("pos"), F.lit(n)), F.lit(n))
    return (
        j.withColumn("cov", covered)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("dup_windows"),
            F.sum("cov").cast("bigint").alias("covered_tokens"),
            F.max("nt").cast("bigint").alias("total_tokens"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.col("covered_tokens").cast("double")
                / F.col("total_tokens"),
                6,
            ),
        )
    )


def duplicate_ngram_spans_oracle_sql(
    n: int = 8, min_count: int = 2, table: str = "documents"
) -> str:
    """DuckDB twin of duplicate_ngram_spans (gram-text keys, identical
    window/coverage arithmetic — all-integer inputs, so the one
    division is bit-exact)."""
    return f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
           FROM {table}),
tn AS (SELECT doc_id, w, len(w) AS nt FROM t),
ps AS (SELECT doc_id, w, nt,
              unnest(range(0, greatest(nt - {n} + 1, 0))) AS pos
       FROM tn),
wins AS (SELECT doc_id, nt, pos,
                array_to_string(w[pos + 1 : pos + {n}], ' ') AS gram
         FROM ps),
c AS (SELECT gram FROM wins GROUP BY gram HAVING COUNT(*) >= {min_count}),
j AS (SELECT wins.* FROM wins JOIN c USING (gram)),
s AS (SELECT doc_id, nt, pos,
             lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      FROM j)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS dup_windows,
  CAST(SUM(LEAST(COALESCE(nxt - pos, {n}), {n})) AS BIGINT)
    AS covered_tokens,
  CAST(MAX(nt) AS BIGINT) AS total_tokens,
  ROUND(CAST(SUM(LEAST(COALESCE(nxt - pos, {n}), {n})) AS DOUBLE)
        / MAX(nt), 6) AS dup_ratio
FROM s GROUP BY doc_id
"""


def paragraph_block_dedup(
    docs: DataFrame, blk: int = 20, min_count: int = 2,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Paragraph/block-level corpus dedup with first-occurrence keep
    (the C4 "remove repeated lines" rule generalized to fixed
    ``blk``-token blocks, since the fixture corpus has no newline
    paragraph structure): chop each doc into NON-overlapping
    ``blk``-token blocks, count each distinct block text corpus-wide,
    and remove every occurrence of a block seen ≥ ``min_count`` times
    EXCEPT its globally-first occurrence (ordered by
    ``(doc_id, blk_idx)`` — the canonical keeper, so dedup output is
    deterministic and exactly one copy of every repeated block
    survives). Returns per-doc block/token removal stats plus an md5
    digest of the reconstructed kept text, making the gate value-exact
    on the surviving bytes without shipping the text column.

    Differs from ``duplicate_ngram_spans`` (overlapping windows,
    report-only): this is the REMOVAL op — non-overlapping blocks, a
    keeper election, and a reconstruction digest.

    100 TB shape: the block explode is linear (nt/blk rows per doc,
    strictly fewer than the token count); block counting + keeper
    election is ONE groupBy on the block text with map-side partial
    ``count``/``min(struct)``; flagged blocks (only those with
    n_occ ≥ min_count — the long unique tail never shuffles twice)
    join back with one equi-join that AQE skew-splits on hot
    boilerplate blocks; the final per-doc rollup groups on doc_id.
    At scale, key on ``xxhash64(block)`` instead of the text so
    shuffle rows carry 8 bytes (digest-key discipline of
    ``exact_dup_groups``); text keys here keep the DuckDB twin
    hash-free. Reference parity: the reference's resource/scope
    content dedup (go/pkg/otel/common/arrow/resource.go) is the same
    keep-one-copy-of-repeated-content discipline at attribute scope.
    """
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("w"),
    ).withColumn("nt", F.size("w"))
    nblk = F.greatest(
        F.floor((F.col("nt") + blk - 1) / blk).cast("int"), F.lit(1)
    )
    blocks = F.transform(
        F.sequence(F.lit(0), nblk - 1),
        lambda i: F.concat_ws(" ", F.slice(F.col("w"), i * blk + 1, blk)),
    )
    b = (
        t.select("doc_id", "nt", F.posexplode(blocks).alias("blk_idx", "block"))
        .withColumn(
            "blk_tokens",
            F.least(F.lit(blk), F.col("nt") - F.col("blk_idx") * blk),
        )
    )
    # one shuffle: corpus-wide count + keeper election per block text;
    # only repeated blocks (tiny vs the unique tail) flow to the join
    keepers = (
        b.groupBy("block")
        .agg(
            F.count("*").alias("n_occ"),
            F.min(F.struct("doc_id", "blk_idx")).alias("keeper"),
        )
        .filter(F.col("n_occ") >= min_count)
        .select("block", "keeper")
    )
    j = b.join(keepers, "block", "left")
    removed = F.col("keeper").isNotNull() & ~(
        (F.col("doc_id") == F.col("keeper.doc_id"))
        & (F.col("blk_idx") == F.col("keeper.blk_idx"))
    )
    kept_struct = F.when(
        ~removed, F.struct(F.col("blk_idx"), F.col("block"))
    )
    return (
        j.withColumn("removed", removed)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_blocks"),
            F.sum(F.col("removed").cast("int")).cast("bigint")
            .alias("removed_blocks"),
            F.max("nt").cast("bigint").alias("total_tokens"),
            F.sum(
                F.when(~F.col("removed"), F.col("blk_tokens")).otherwise(0)
            ).cast("bigint").alias("kept_tokens"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda s: s.getField("block"),
                    ),
                )
            ).alias("kept_digest"),
        )
        .withColumn(
            "kept_ratio",
            F.round(
                F.col("kept_tokens").cast("double") / F.col("total_tokens"),
                6,
            ),
        )
    )


def paragraph_block_dedup_oracle_sql(
    blk: int = 20, min_count: int = 2, table: str = "documents"
) -> str:
    """DuckDB twin of paragraph_block_dedup — identical block
    chopping, keeper election (min (doc_id, blk_idx) per block text),
    removal rule, and md5-of-reconstruction (COALESCE '' for the
    everything-removed doc, matching concat_ws over an empty array)."""
    return f"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w
           FROM {table}),
tn AS (SELECT doc_id, w, len(w) AS nt FROM t),
ps AS (SELECT doc_id, w, nt,
              unnest(range(0, greatest((nt + {blk} - 1) // {blk}, 1)))
                AS blk_idx
       FROM tn),
b AS (SELECT doc_id, nt, blk_idx,
             array_to_string(
               w[blk_idx * {blk} + 1 : blk_idx * {blk} + {blk}], ' ')
               AS block,
             LEAST({blk}, nt - blk_idx * {blk}) AS blk_tokens
      FROM ps),
k AS (SELECT block,
             MIN(struct_pack(d := doc_id, i := blk_idx)) AS keeper
      FROM b GROUP BY block HAVING COUNT(*) >= {min_count}),
j AS (SELECT b.*,
             k.block IS NOT NULL
               AND NOT (b.doc_id = k.keeper.d
                        AND b.blk_idx = k.keeper.i) AS removed
      FROM b LEFT JOIN k USING (block))
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS n_blocks,
  CAST(SUM(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
    AS removed_blocks,
  CAST(MAX(nt) AS BIGINT) AS total_tokens,
  CAST(SUM(CASE WHEN removed THEN 0 ELSE blk_tokens END) AS BIGINT)
    AS kept_tokens,
  md5(COALESCE(
    string_agg(block, ' ' ORDER BY blk_idx)
      FILTER (WHERE NOT removed), '')) AS kept_digest,
  ROUND(CAST(SUM(CASE WHEN removed THEN 0 ELSE blk_tokens END) AS DOUBLE)
        / MAX(nt), 6) AS kept_ratio
FROM j GROUP BY doc_id
"""
