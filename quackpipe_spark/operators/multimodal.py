"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side contract is real and tested — schema, partition-preserving
mapInPandas plumbing, Arrow batch shapes, deterministic metadata extraction.
Decode has two modes:

- ``fake=True`` — deterministic digest-derived decode so downstream stages
  (resize geometry, frame sampling cadence, feature vectors) are exercised
  end-to-end with no media libraries.
- ``fake=False`` — REAL decode behind import gates: WAV audio via the
  stdlib ``wave`` module (always available), other audio via ``soundfile``
  when installed, images via Pillow when installed; video and
  missing-library cases raise NotImplementedError loudly (a library gap is
  a config error, not a corrupt row). Tests for gated decoders skip where
  the library is absent, like the jar-gated S3 e2e.

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


def _decode_image_real(payload: bytes, dim: int) -> tuple[dict, list[float]]:
    """Pillow-gated image decode: true (width, height, n_frames) plus a
    content feature — the 8×8 grayscale thumbnail's row means scaled to
    [0, 1] (a classic perceptual-hash precursor; deterministic)."""
    import io

    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "image decode requires Pillow (not installed); pass fake=True "
            "for the deterministic stub"
        ) from e
    img = Image.open(io.BytesIO(payload))
    w, h = img.size
    n = int(getattr(img, "n_frames", 1))
    thumb = img.convert("L").resize((8, 8))
    px = list(thumb.getdata())
    rows = [sum(px[r * 8 : r * 8 + 8]) / (8 * 255.0) for r in range(8)]
    return {"width": w, "height": h, "n_frames": n}, _pad(rows, dim)


def _decode_audio_real(payload: bytes, dim: int) -> tuple[dict, list[float]]:
    """Audio decode: WAV rides the stdlib ``wave`` module (no extra deps,
    exercised in CI); other containers go through ``soundfile`` when
    installed. Metadata maps onto the media schema as n_frames = sample
    frames (width/height stay 0); the feature carries (sample_rate,
    channels, sample_width, duration_s) — the relational-side fields a
    curation pipeline filters on."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            rate, ch, sw, nf = (
                w.getframerate(), w.getnchannels(), w.getsampwidth(), w.getnframes()
            )
        feat = [float(rate), float(ch), float(sw), nf / rate if rate else 0.0]
        return {"width": 0, "height": 0, "n_frames": nf}, _pad(feat, dim)
    except wave.Error:
        pass
    try:
        import soundfile
    except ImportError as e:
        # Distinguish "recognized format, missing backend" (must fail
        # loudly — silently dropping every FLAC on a misconfigured
        # cluster acks an empty decode) from garbage bytes (corrupt row,
        # caller skips): sniff the container magic. RIFF/WAVE is in the
        # list too — the stdlib module only handles integer-PCM WAVs, so
        # a valid IEEE-float WAV (format tag 3, scipy/librosa's default)
        # lands here via wave.Error and needs soundfile, loudly.
        head = bytes(payload[:12])
        known = (b"fLaC", b"OggS", b"ID3", b"\xff\xfb", b"\xff\xf3", b"\xff\xf2")
        if (
            head.startswith(known)
            or head[4:8] == b"ftyp"
            or (head[:4] == b"RIFF" and head[8:12] == b"WAVE")
        ):
            raise NotImplementedError(
                "audio decode for this format requires soundfile (not "
                "installed); pass fake=True for the deterministic stub"
            ) from e
        raise ValueError("unrecognized audio payload") from e
    # header-only metadata: soundfile.read would materialize the FULL
    # decoded waveform (a 1 GB FLAC ≈ several GB of float64) inside the
    # Arrow worker just to read shape/rate — info() reads the header
    # (review r14)
    info = soundfile.info(io.BytesIO(payload))
    nf = int(info.frames)
    feat = [
        float(info.samplerate),
        float(info.channels),
        0.0,
        nf / info.samplerate if info.samplerate else 0.0,
    ]
    return {"width": 0, "height": 0, "n_frames": nf}, _pad(feat, dim)


def _pad(feat: list[float], dim: int) -> list[float]:
    """Fixed-width feature contract: every kind emits EXACTLY dim
    elements (audio's 4 header fields previously came out shorter than
    image's 8 thumbnail rows — a jagged feature column that crashes any
    consumer assembling a fixed-width matrix; review r14)."""
    return (feat + [0.0] * dim)[:dim]


def _decode_real(payload: bytes, kind: str, dim: int) -> tuple[dict, list[float]]:
    if kind == "image":
        return _decode_image_real(payload, dim)
    if kind == "audio":
        return _decode_audio_real(payload, dim)
    if kind == "video":
        # RECOGNIZED kind, no gated backend: fail the job loudly like a
        # missing library (silently skipping every video would ack an
        # empty decode as success)
        raise NotImplementedError(
            "real decode for kind='video' has no gated backend (no video "
            "library is import-gated); pass fake=True for the "
            "deterministic stub"
        )
    # UNKNOWN/NULL kind is corrupt METADATA, not a missing backend: one
    # bad row must skip like a corrupt payload, not kill the 100TB job
    # (review r14) — ValueError routes to decode_iter's skip class
    raise ValueError(f"unrecognized media kind {kind!r}")


def decode_media(media: DataFrame, fake: bool = False, batch_feature_dim: int = 8) -> DataFrame:
    """mapInPandas decode/feature-extract: binary → (dims, frames, feature
    vector). ``fake=False`` uses the import-gated real decoders (see
    module docstring); a row whose payload fails to PARSE is skipped like
    a corrupt blob, but a MISSING LIBRARY raises — silently skipping every
    row of a misconfigured cluster would ack an empty decode as success.

    Fans out first (gated, data-sized): a compact single-file source
    would otherwise run the whole Python decode in ONE Arrow worker —
    decode is the classic embarrassingly-parallel stage. The fan-out
    width follows the INPUT VOLUME (one task per ~4 MB of payload),
    not the core count: a kilobyte-scale media table keeps its splits
    (no exchange, no N-way Python worker dispatch for microseconds of
    decode — guide §4/§2.2), while on an already-split 100 TB input the
    gate skips the shuffle entirely (payload bytes are the widest
    column in the table; re-shuffling them for no parallelism gain is
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
    # 128 KB/task: decode cost is per ROW (Python loop + hash per
    # payload), not per byte — a 4 MB/task sizing measured +315% at the
    # 20× growth SF (33k rows of per-row Python per task); at 128 KB
    # anything past ~4 MB of payload fans fully out while a toy media
    # table still skips the exchange
    media = fan_out(media, bytes_per_task=128 << 10)

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
                if fake:
                    digest = hashlib.sha256(bytes(payload)).digest()
                    meta = _fake_decode(digest, kind)
                    feature = [
                        struct.unpack(">f", digest[4 * i : 4 * i + 4])[0]
                        for i in range(batch_feature_dim)
                    ]
                    # NaN/inf from raw bytes → clamp to keep features usable
                    feature = [x if x == x and abs(x) < 1e30 else 0.0 for x in feature]
                else:
                    try:
                        meta, feature = _decode_real(
                            bytes(payload), kind, batch_feature_dim
                        )
                    except NotImplementedError:
                        raise  # missing backend: fail the job, loudly
                    except Exception:
                        continue  # corrupt payload: skip the row
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
