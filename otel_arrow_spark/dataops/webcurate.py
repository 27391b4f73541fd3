"""Web-corpus curation: URL canonicalization and per-domain quota
sampling — the two front-door operations of a crawl-derived training
pipeline (dedup keys come from canonical URLs; domain quotas stop a
handful of mega-sites from dominating the mixture).

Scale shape
-----------
* :func:`canonicalize_url` is pure per-row JVM regex codegen — zero
  shuffles, composes with any downstream dedup (the canonical string is
  the natural exact-dedup key at 100 TB).
* :func:`domain_cap_sample` mirrors the LSH hot-bucket-cap discipline
  (``dedup.py``): a domain-count aggregate finds the (few, by Zipf)
  OVERSIZED domains; rows of small domains pass through with a
  broadcast anti-join (no window, no sort); only the oversized
  partition pays a per-domain rank, ordered by a content-derived
  SHA hash (``hashing.h32``) so the kept sample is deterministic on any
  engine and any partitioning — never ``ORDER BY rand()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from otel_arrow_spark.dataops.hashing import h32

# query-string parameters that never change page content (tracking)
TRACKING_PARAM_RE = r"^(utm_[a-z]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)="


def canonicalize_url(df: DataFrame, url_col: str = "url",
                     out_col: str = "canon_url") -> DataFrame:
    """Normalize a URL column to its canonical form.

    Rules (the common-crawl canon): lowercase scheme and host, strip
    the fragment, default ports (:80/:443) and a leading ``www.``,
    collapse duplicate slashes in the path and drop a trailing slash,
    drop tracking query parameters (``TRACKING_PARAM_RE``) and sort the
    surviving ones. All regexp/array codegen — no UDF, no shuffle.
    """
    u = F.trim(F.col(url_col))
    u = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/{2,}", "/")
    path = F.regexp_replace(path, r"/$", "")
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    q = F.array_join(params, "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)))
    return df.withColumn(out_col, canon)


def url_domain(canon: Column) -> Column:
    """Host of a canonical URL (registrable-domain heuristics are a
    policy choice layered on top; the raw host is the quota key here)."""
    return F.regexp_extract(canon, r"^[a-z][a-z0-9+.\-]*://([^/?#]+)", 1)


def domain_cap_sample(df: DataFrame, cap: int,
                      canon_col: str = "canon_url",
                      id_col: str = "doc_id") -> DataFrame:
    """Keep at most ``cap`` rows per domain, deterministically.

    Small domains (count ≤ cap, the overwhelming majority under a Zipf
    domain distribution) pass through untouched via a broadcast
    anti-join against the oversized-domain list; only oversized domains
    pay a per-domain ``row_number`` ordered by the content hash
    ``h32(canon || id)`` (ties by id) — the same two-path cap the LSH
    hot-bucket guard uses, so no global sort and no skewed full-table
    window at 100 TB.
    """
    if cap < 1:
        raise ValueError("domain_cap_sample: cap must be ≥ 1")
    d = df.withColumn("_dom", url_domain(F.col(canon_col)))
    over = (
        d.groupBy("_dom").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select("_dom")
    )
    small = d.join(F.broadcast(over), "_dom", "left_anti")
    big = d.join(F.broadcast(over), "_dom", "left_semi")
    hkey = h32(F.concat(
        F.col(canon_col), F.lit("|"), F.col(id_col).cast("string")))
    w = Window.partitionBy("_dom").orderBy(
        hkey.asc(), F.col(id_col).asc())
    kept_big = (
        big.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= cap)
        .drop("_r")
    )
    return small.unionByName(kept_big).drop("_dom")
