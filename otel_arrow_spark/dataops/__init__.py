"""Large-scale training-data operations over document/embedding tables.

Beyond the reference's telemetry operators, a 100 TB pipeline needs
dataset-curation primitives: deduplication (exact, MinHash-LSH, SimHash,
n-gram Jaccard, embedding near-dup), similarity search (brute-force and
LSH-bucketed ANN), text analysis (language ID, quality scoring, token
counting, fingerprinting), and multimodal column plumbing. All are
expressed as declarative DataFrame transformations (whole-stage codegen,
no per-row Python) except the multimodal decode path, which is an
Arrow-batched ``mapInPandas`` with a stubbed codec.
"""

from otel_arrow_spark.dataops.hashing import h32, shingles, words_of
from otel_arrow_spark.dataops import dedup, similarity, textstats, multimodal

__all__ = [
    "h32", "shingles", "words_of", "dedup", "similarity", "textstats",
    "multimodal",
]
