"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract is real and tested — schema, partition-preserving
mapInPandas plumbing, Arrow batch shapes, deterministic metadata extraction
— while the actual media decode is stubbed (no image/audio libs in this
container): ``decode_image`` raises NotImplementedError unless
``fake=True``, which produces a deterministic fake decode so downstream
stages (resize geometry, frame sampling cadence, feature vectors) are
exercised end-to-end.

At scale the pattern is: binary column stays columnar in parquet (no
base64 blowup), decode happens executor-side in Arrow-batched Python with
``maxRecordsPerBatch`` sized to keep batch memory bounded, and extracted
features land in ordinary columns where every relational operator applies.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: The canonical media-table shape (attach_binary produces it;
#: decode_media validates its inputs against the required subset).
MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, byte_len long, sha256 string"
)
_REQUIRED_DECODE_COLS = ("media_id", "kind", "payload")


def attach_binary(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Testing shim: wrap a text column as a binary payload with typed
    metadata (the shape a real image/audio table has)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("kind"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("byte_len"),
        F.sha2(payload, 256).alias("sha256"),
    )


def _fake_decode(digest: bytes, kind: str) -> dict:
    """Deterministic fake decode: dimensions/duration derived from the
    payload's sha256 digest so tests are stable and content-sensitive
    (the caller passes the digest it already computed for the feature
    vector — one hash per payload, not two)."""
    a, b, c = struct.unpack(">HHH", digest[:6])
    if kind == "image":
        return {"width": 64 + a % 1024, "height": 64 + b % 1024, "n_frames": 1}
    if kind == "video":
        return {"width": 64 + a % 1024, "height": 64 + b % 1024, "n_frames": 1 + c % 300}
    return {"width": 0, "height": 0, "n_frames": 1 + c % 100}  # audio: frames≈chunks


def decode_media(media: DataFrame, fake: bool = False, batch_feature_dim: int = 8) -> DataFrame:
    """mapInPandas decode/feature-extract: binary → (dims, frames, feature
    vector). Real decode is stubbed (see module docstring).

    Fans out first (gated): a compact single-file source would otherwise
    run the whole Python decode in ONE Arrow worker — decode is the
    classic embarrassingly-parallel stage. On an already-split input the
    gate skips the shuffle entirely (payload bytes are the widest column
    in the table; re-shuffling them at 100 TB for no parallelism gain is
    pure waste)."""
    import pandas as pd

    from quackpipe_spark.operators.util import fan_out

    if not 1 <= batch_feature_dim <= 8:
        # the feature vector unpacks 4-byte floats from a 32-byte sha256
        # digest: more than 8 would crash struct.unpack inside an
        # executor mid-job — reject at plan time instead
        raise ValueError(
            f"batch_feature_dim must be in [1, 8] (32-byte digest / 4-byte "
            f"floats), got {batch_feature_dim}"
        )
    missing = [c for c in _REQUIRED_DECODE_COLS if c not in media.columns]
    if missing:
        raise ValueError(f"decode_media input lacks column(s) {missing}; "
                         f"expected the MEDIA_SCHEMA shape")
    media = fan_out(media)

    out_schema = (
        "media_id long, kind string, width int, height int, n_frames int, "
        f"feature array<float>"
    )

    def decode_iter(batches):
        for pdf in batches:
            rows = []
            for media_id, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                if payload is None or media_id != media_id or media_id is None:
                    # no payload, or NULL id (pandas floats it to NaN —
                    # int(NaN) would crash the stage): skip the row like
                    # a corrupt blob rather than failing the job
                    continue
                if not fake:
                    raise NotImplementedError(
                        "media decode requires image/audio libraries not present "
                        "in this environment; pass fake=True for the deterministic stub"
                    )
                digest = hashlib.sha256(bytes(payload)).digest()
                meta = _fake_decode(digest, kind)
                feature = [
                    struct.unpack(">f", digest[4 * i : 4 * i + 4])[0] for i in range(batch_feature_dim)
                ]
                # NaN/inf from raw bytes → clamp to keep features usable
                feature = [x if x == x and abs(x) < 1e30 else 0.0 for x in feature]
                rows.append((int(media_id), kind, meta["width"], meta["height"], meta["n_frames"], feature))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "n_frames", "feature"]
            )

    return media.mapInPandas(decode_iter, out_schema)


def sample_frames(decoded: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling plan: one row per sampled frame index — pure JVM
    (sequence+explode), no Python in the hot path."""
    if every_n < 1:
        # sequence(..., step=0) raises mid-job on the first multi-frame
        # video; reject at plan time like decode_media's dim guard
        raise ValueError("every_n must be >= 1")
    # n_frames=0 (a real decoder's empty/corrupt video) must yield zero
    # sampled frames, not a runtime error: sequence(0, -1, n) infers
    # illegal boundaries (the shingles trap)
    idx = F.when(
        F.col("n_frames") > 0,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return decoded.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(idx).alias("frame_idx"),
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Relational metadata pass over the binary column (no decode):
    per-kind count, total/avg payload bytes — the query pattern that must
    stay pushdown-friendly (payload column pruned away unless touched)."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.sum("byte_len").alias("total_bytes"),
        F.round(F.avg("byte_len"), 2).alias("avg_bytes"),
    )
