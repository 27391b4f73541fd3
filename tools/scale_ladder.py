#!/usr/bin/env python
"""Scale-ladder evidence: run the most expensive dataops/dedup/ANN
queries at sf0.1 (driver-provided) and at a generated sf1 (10x rows)
and record the wall-time ratios in BENCH/scale_ladder.md.

A linear-plan query should scale at ~<= 12x for 10x input (10x work
plus fixed per-query overhead amortized differently); anything
super-linear gets flagged for a floor investigation.

The sf1 fixture is synthesized deterministically (seed 1234) with the
same schema and statistical shape as the driver's sf0.1 tables — same
5-language mix, same 20 sources, the same document vocabulary (pulled
from sf0.1 itself), 10-label clustered 64-dim embeddings, uniform
5-type events over the same January-2024 window. Only the three tables
the ladder queries read (documents, embeddings, events) are generated.
Regenerate any time: python tools/scale_ladder.py [--gen-only]

Usage: python tools/scale_ladder.py [query ...]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_SF1_DIR (default /tmp/spark_graft_sf1)
       SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 1234
SCALE = 10
REPEAT = 2          # per query per scale; best-of damps JIT/GC noise
SUPERLINEAR = 12.0  # 10x rows + amortization slack

LADDER = [
    "curation_clustered_stats",
    "kql_bag_surgery",
    "ann_ivf_trained_topk",
    "kql_text_scan_declare",
    "dedup_neardup_clusters",
    "dedup_clusters_star",
    "kql_text_scan_matches",
    "curation_stats",
    "dedup_cross_corpus",
    "text_tfidf_keywords",
]


def generate_sf1(src_dir: str, out_dir: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(SEED)

    # --- documents: same vocab as the source corpus, fresh texts ----
    src_docs = pq.read_table(os.path.join(src_dir, "documents.parquet"))
    vocab = sorted({w for t in src_docs.column("text").to_pylist()
                    for w in t.split()})
    langs = ["en", "de", "es", "fr", "zh"]
    # en-heavy mix matching the source (~44% en, rest even)
    lang_p = [0.44, 0.14, 0.14, 0.14, 0.14]
    n_docs = len(src_docs) * SCALE
    n_words = rng.integers(8, 101, n_docs)
    vocab_arr = np.array(vocab)
    texts = [" ".join(vocab_arr[rng.integers(0, len(vocab), k)])
             for k in n_words]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(rng.choice(langs, n_docs, p=lang_p)),
        "source": pa.array([f"src{i}" for i in
                            rng.integers(0, 20, n_docs)]),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), os.path.join(out_dir, "documents.parquet"))

    # --- embeddings: 10 label clusters in 64-dim ---------------------
    n_vecs = 2000 * SCALE
    labels = rng.integers(0, 10, n_vecs)
    centroids = rng.normal(0.0, 1.0, (10, 64))
    emb = (centroids[labels] * 2.0
           + rng.normal(0.0, 1.0, (n_vecs, 64))).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(n_vecs), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }), os.path.join(out_dir, "embeddings.parquet"))

    # --- events: uniform 5-type stream over the same window ----------
    n_ev = 100_000 * SCALE
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = base + rng.integers(0, span_us, n_ev).astype("timedelta64[us]")
    etypes = np.array(["click", "view", "purchase", "signup", "error"])
    pq.write_table(pa.table({
        "event_id": pa.array(range(n_ev), pa.int64()),
        "ts": pa.array(np.sort(ts)),
        "user_id": pa.array(rng.integers(1, 15_001, n_ev), pa.int64()),
        "event_type": pa.array(etypes[rng.integers(0, 5, n_ev)]),
        "value": pa.array(rng.uniform(0, 100, n_ev).round(6)),
        "props": pa.array([f'{{"k": {k}}}' for k in
                           rng.integers(0, 100, n_ev)]),
    }), os.path.join(out_dir, "events.parquet"))


def main() -> None:
    sf01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    names = [a for a in sys.argv[1:] if not a.startswith("--")] or LADDER

    if not os.path.exists(os.path.join(sf1, "events.parquet")):
        print(f"generating sf1 fixture at {sf1} …", file=sys.stderr)
        generate_sf1(sf01, sf1)
    if "--gen-only" in sys.argv:
        return

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod
    from otel_arrow_spark.dataops.dedup import release_caches

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "48g")
        .appName("scale_ladder")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    def run(name: str, sf_dir: str) -> list[float]:
        outs = []
        for _ in range(REPEAT):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            outs.append(round(time.monotonic() - t0, 3))
            release_caches()
        return outs

    rows = []
    for name in names:
        r01 = run(name, sf01)
        r1 = run(name, sf1)
        ratio = round(min(r1) / max(min(r01), 1e-9), 2)
        rows.append((name, r01, r1, ratio))
        print(json.dumps({"query": name, "sf0.1": r01, "sf1": r1,
                          "ratio": ratio}))

    md = [
        "# Scale ladder — sf0.1 vs generated sf1 (10x rows)",
        "",
        f"local[{cpus}], best-of-{REPEAT} per scale per query; fixture "
        f"generated by `tools/scale_ladder.py` (seed {SEED}; documents "
        "50k / embeddings 20k / events 1M rows, same shape as the "
        "driver's sf0.1 tables). A linear-plan query should land at "
        f"<= {SUPERLINEAR}x for 10x input; anything above is flagged.",
        "",
        "| query | sf0.1 best (s) | sf1 best (s) | ratio | verdict |",
        "|---|---|---|---|---|",
    ]
    for name, r01, r1, ratio in rows:
        verdict = ("OK" if ratio <= SUPERLINEAR
                   else "FLAG — investigate")
        md.append(f"| {name} | {min(r01)} | {min(r1)} | "
                  f"{ratio}x | {verdict} |")
    md += [
        "",
        "All runs: " + json.dumps(
            {n: {"sf0.1": a, "sf1": b} for n, a, b, _ in rows}),
        "",
    ]
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "scale_ladder.md")
    with open(out, "w") as fh:
        fh.write("\n".join(md))
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
