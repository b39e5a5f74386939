"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed in Arrow batches via ``mapInPandas``.

The pages table already carries one binary column (``html``); the same
pattern covers image/audio/video payloads at corpus scale:

  * payloads stay opaque ``binary`` end-to-end (never decoded into JVM
    rows — only inside Arrow batches, bounded by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``);
  * metadata is a typed struct column so pruning/filtering stays
    columnar (filter on ``meta.kind``/``meta.n_bytes`` never touches
    payload bytes — parquet column pruning skips them entirely);
  * decode/feature-extract are iterator-form ``mapInPandas`` UDFs: one
    python worker per partition, model/codec init once per iterator
    (the per-executor-singleton pattern, SURVEY.md §4).

Real codecs (PIL/ffmpeg/...) are not in this container; the decode step
is STUBBED behind ``decoder=``: the default ``"fake"`` decoder derives
deterministic pseudo-features from the bytes (real plumbing, fake
pixels); ``decoder="real"`` raises ``NotImplementedError`` at the call
site, not inside executors.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, payload binary, "
    "meta struct<kind:string, n_bytes:bigint, content_type:string>"
)

FEATURE_SCHEMA = (
    "media_id string, kind string, n_bytes bigint, "
    "feature array<float>, checksum string"
)


def attach_media_meta(
    df: DataFrame, id_col: str, payload_col: str, kind: str, content_type: str
) -> DataFrame:
    """Wrap a raw binary column into the typed media shape."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.col(payload_col).alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.length(F.col(payload_col)).cast("bigint").alias("n_bytes"),
            F.lit(content_type).alias("content_type"),
        ).alias("meta"),
    )


def _fake_feature_batches(batches: Iterator[pd.DataFrame], dim: int) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for decode→feature-extract. Features are
    byte-histogram moments — a real function of the payload, so tests
    exercise true data flow (schema, batching, null payloads) without a
    codec. Runs per Arrow batch; no per-row Python dispatch."""
    import hashlib

    import numpy as np

    for pdf in batches:
        feats, sums = [], []
        for payload in pdf["payload"]:
            if payload is None:
                feats.append(None)
                sums.append(None)
                continue
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist = np.bincount(arr % 16, minlength=16).astype("float32")
            hist /= max(float(hist.sum()), 1.0)
            feats.append(hist[:dim].tolist())
            sums.append(hashlib.md5(payload).hexdigest())
        yield pd.DataFrame(
            {
                "media_id": pdf["media_id"],
                "kind": [m["kind"] for m in pdf["meta"]],
                "n_bytes": [m["n_bytes"] for m in pdf["meta"]],
                "feature": feats,
                "checksum": sums,
            }
        )


def extract_media_features(
    media: DataFrame, decoder: str = "fake", dim: int = 16
) -> DataFrame:
    """binary payloads → feature vectors, Arrow-batched.

    ``decoder="real"`` is the integration point for an actual
    image/audio codec stack (PIL / torchaudio / ffmpeg inside
    ``mapInPandas``); unavailable in this environment by design.
    """
    if decoder == "real":
        raise NotImplementedError(
            "real media decoding needs codec libraries not present in this "
            "container; use decoder='fake' (deterministic byte-derived "
            "features exercising the identical Spark plumbing)"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")
    return media.mapInPandas(
        lambda it: _fake_feature_batches(it, dim), schema=FEATURE_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame, every_n_bytes: int = 4096, max_frames: int = 8
) -> DataFrame:
    """Video-style frame sampling *plan*: one output row per sampled
    offset, computed columnar-side (explode over a sequence) so the
    expensive per-frame decode UDF downstream sees pre-sharded work.
    Payload bytes are NOT copied per frame — only (media_id, offset)."""
    n = F.col("meta.n_bytes")
    # zero-byte payloads sample NO frames: the greatest(n-1, 0) clamp
    # alone would emit a frame at offset 0 of a payload with no bytes
    # (null array → posexplode drops the row)
    offsets = F.when(
        n > 0,
        F.slice(
            F.sequence(F.lit(0), n - 1, F.lit(every_n_bytes)),
            1,
            max_frames,
        ),
    )
    return media.select(
        "media_id", "meta", F.posexplode(offsets).alias("frame_idx", "byte_offset")
    )
