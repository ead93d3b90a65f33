"""Multimodal columns (task spec): image/audio/video as opaque `binary`
columns with typed metadata.

The Spark-side plumbing — schema, partition-preserving mapInPandas, Arrow
batch shape, deterministic fake features — is real and tested; the actual
codec decode is STUBBED (no image/audio libraries exist in this sandbox):
`decode_stub=True` produces deterministic pseudo-features from the bytes,
`decode_stub=False` raises NotImplementedError at the exact point a real
decoder (PIL/ffmpeg) would be called.

Media rows originate from the documents table's media spans
(kind='media', media_ref='media://<hash>') — SURVEY §1.2.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("media_type", T.StringType()),   # image|audio|video
    T.StructField("payload", T.BinaryType()),      # opaque bytes
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])


def media_table(docs: DataFrame) -> DataFrame:
    """documents -> media rows with synthetic opaque payloads.

    Payload bytes are a deterministic function of media_ref (sha256-seeded)
    — stands in for fetching the blob from object storage; everything
    downstream treats them as opaque binary."""
    from ..sources.spans import explode_spans

    media = explode_spans(docs, kinds=["media"]).filter(F.col("media_ref") != "")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.pmod(F.xxhash64("media_ref"), F.lit(3)) + 1).cast("int"),
    )
    return media.select(
        "doc_id",
        "media_ref",
        mt.alias("media_type"),
        F.sha2(F.col("media_ref"), 256).cast("binary").alias("payload"),
        F.map_from_arrays(
            F.array(F.lit("source_offset"), F.lit("codec")),
            F.array(F.col("offset").cast("string"),
                    F.concat(F.lit("fake/"), mt)),
        ).alias("meta"),
    )


FEATURE_DIM = 16

_FEATURES_OUT = (
    "doc_id string, media_ref string, media_type string, "
    f"n_bytes long, features array<double>"
)


def _image_decoder():
    """Real image decoder when PIL is importable, else None (import-gated:
    the stub self-upgrades on a full environment; this sandbox has no
    image/audio libraries)."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError:
        return None

    import io

    def decode(payload: bytes) -> np.ndarray:
        img = Image.open(io.BytesIO(payload)).convert("L")
        arr = np.asarray(img, dtype=np.float64)
        # cheap deterministic features: dims + intensity histogram
        hist, _ = np.histogram(arr, bins=FEATURE_DIM - 2, range=(0, 255))
        return np.concatenate(
            [[float(img.width), float(img.height)],
             hist / max(arr.size, 1)]
        )

    return decode


def _stub_features(payload: bytes) -> np.ndarray:
    """Deterministic fake 'embedding': bytes -> seeded gaussian."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    return np.random.default_rng(seed).standard_normal(FEATURE_DIM)


def extract_features(media: DataFrame,
                     decode_stub: bool | None = None,
                     decoder_factory=None) -> DataFrame:
    """mapInPandas feature extraction over opaque payloads.

    decode_stub=None (default, AUTO): a real decoder — when importable —
    runs ONLY on media_type == 'image' payloads, and any per-payload
    decode failure falls back to the deterministic stub features, so a
    PIL-equipped environment never crashes on synthetic/corrupt payloads
    or on audio/video rows (round-3 ADVICE medium: the old auto mode ran
    the image decoder on EVERY payload).  Audio/video always take the
    stub (no real decoder exists for them).

    decode_stub=True forces the stub everywhere (used by the driver
    goldens — stable regardless of the environment).

    decode_stub=False is STRICT: demands real decode — raises
    NotImplementedError for non-image media types and for executors where
    no decoder is importable, and propagates image decode errors.

    decoder_factory: override for the decoder resolver (tests inject a
    failing decoder to pin the fallback behavior; defaults to the
    import-gated PIL resolver).

    Real pipeline shape in every mode: iterator of Arrow batches in,
    per-batch numpy work, feature vectors out."""
    # mode selection runs on the DRIVER (deterministic choice for the
    # whole job); the decoder itself is re-resolved lazily on each
    # EXECUTOR — shipping a driver-imported PIL closure would crash task
    # deserialization on executors without the library.  In AUTO mode an
    # executor without the library degrades to the stub; STRICT mode
    # fails there with the explicit error below.
    factory = decoder_factory if decoder_factory is not None else _image_decoder
    if decode_stub is None:
        mode = "stub" if factory() is None else "auto"
    else:
        mode = "stub" if decode_stub else "strict"

    def run(batches):
        decoder = None if mode == "stub" else factory()
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["payload"], pdf["media_type"]):
                pb = bytes(payload)
                if mode == "strict":
                    if decoder is None:
                        raise NotImplementedError(
                            "real media decode requires PIL/ffmpeg on the "
                            "EXECUTORS — not importable in this worker "
                            "environment (driver-side detection may differ)"
                        )
                    if mtype != "image":
                        raise NotImplementedError(
                            f"no real decoder exists for media_type="
                            f"'{mtype}' (only image decode is implemented)"
                        )
                    feats.append(decoder(pb))
                    continue
                if mode == "auto" and decoder is not None and mtype == "image":
                    try:
                        feats.append(decoder(pb))
                        continue
                    except Exception:
                        pass  # non-decodable payload -> stub fallback
                feats.append(_stub_features(pb))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_ref": pdf["media_ref"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "features": feats,
            })

    return media.mapInPandas(run, schema=_FEATURES_OUT)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image-resize plumbing: passes payload through mapInPandas with the
    target dims recorded in meta; the pixel work is the stubbed step."""
    out_schema = media.schema

    def run(batches):
        for pdf in batches:
            meta = [
                {**(m or {}), "resized": f"{width}x{height}"}
                for m in pdf["meta"]
            ]
            pdf = pdf.assign(meta=meta)
            yield pdf

    return media.mapInPandas(run, schema=out_schema)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame with
    frame_idx; frame bytes are deterministic slices of the payload (stub)."""
    out = ("doc_id string, media_ref string, frame_idx int, frame_bytes binary")

    def run(batches):
        for pdf in batches:
            rows = {"doc_id": [], "media_ref": [], "frame_idx": [],
                    "frame_bytes": []}
            for _, r in pdf.iterrows():
                if r["media_type"] != "video":
                    continue
                payload = bytes(r["payload"])
                n_frames = max(len(payload) // 4, 1)
                for fi in range(0, n_frames, every_n):
                    rows["doc_id"].append(r["doc_id"])
                    rows["media_ref"].append(r["media_ref"])
                    rows["frame_idx"].append(fi)
                    rows["frame_bytes"].append(payload[fi * 4:(fi + 1) * 4])
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=out)
