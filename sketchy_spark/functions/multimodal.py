"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched ``mapInPandas`` stages with real schemas,
partitioning, and batch shapes. The actual codec step is STUBBED
(``decoder='fake'`` produces a deterministic decode; ``decoder='pillow'``
etc. raise ``NotImplementedError``) because the image/audio libs are not
in this container — the Spark-side plumbing is real and tested, and a
production decoder drops into ``_DECODERS`` without touching the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "width int, height int, n_frames int"
)

FEATURE_SCHEMA = "media_id long, kind string, feature array<float>, n_bytes long"
RESIZE_SCHEMA = "media_id long, payload binary, width int, height int"
FRAME_SCHEMA = "media_id long, frame_idx int, payload binary"


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for a codec: derive a (h, w) uint8 plane
    from the payload bytes (tiled). Real decoders replace this."""
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    reps = int(np.ceil(width * height / buf.size))
    return np.tile(buf, reps)[: width * height].reshape(height, width)


def _decode(payload, width, height, decoder: str):
    if decoder == "fake":
        return _fake_decode(payload, width, height)
    raise NotImplementedError(
        f"decoder {decoder!r} requires codec libraries not present in this "
        "environment; plug a real decoder into _DECODERS"
    )


def extract_features(
    media: DataFrame, n_features: int = 16, decoder: str = "fake"
) -> DataFrame:
    """Decode + per-block mean features, one Arrow batch at a time.

    The feature is a fixed-width float vector (usable by the embedding
    dedup/ANN operators downstream) — the multimodal on-ramp into the
    same near-dup machinery as text.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, w, h in zip(
                pdf["payload"], pdf["width"], pdf["height"]
            ):
                plane = _decode(payload, int(w), int(h), decoder)
                blocks = np.array_split(plane.ravel(), n_features)
                feats.append(
                    np.array([b.mean() for b in blocks], dtype=np.float32)
                )
            out = pdf[["media_id", "kind"]].copy()
            out["feature"] = feats
            out["n_bytes"] = [len(p or b"") for p in pdf["payload"]]
            yield out

    return media.mapInPandas(fn, schema=FEATURE_SCHEMA)


def resize(
    media: DataFrame, out_w: int, out_h: int, decoder: str = "fake"
) -> DataFrame:
    """Nearest-neighbor resize on the decoded plane; re-encoded as raw
    bytes (stub encode = tobytes)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for payload, w, h in zip(
                pdf["payload"], pdf["width"], pdf["height"]
            ):
                plane = _decode(payload, int(w), int(h), decoder)
                yi = (np.arange(out_h) * plane.shape[0] // out_h)
                xi = (np.arange(out_w) * plane.shape[1] // out_w)
                payloads.append(plane[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "width": out_w,
                    "height": out_h,
                }
            )

    return media.mapInPandas(fn, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: emit one row per sampled frame —
    a 1->many mapInPandas (batch shape changes, schema stays typed).
    Frame payload slicing is the stub decode (fixed-size frame stride)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                n = int(n_frames or 0)
                if n <= 0 or not payload:
                    continue
                stride = max(len(payload) // max(n, 1), 1)
                for idx in range(0, n, every_n):
                    rows.append(
                        (int(mid), idx, payload[idx * stride : (idx + 1) * stride])
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "payload"]
            )

    return media.where(F.col("kind") == "video").mapInPandas(
        fn, schema=FRAME_SCHEMA
    )


def synthetic_media(spark, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng = np.random.default_rng(seed + i)
                kind = ["image", "audio", "video"][i % 3]
                w, h = 32 + (i % 5) * 8, 24 + (i % 3) * 8
                nf = 30 if kind == "video" else 0
                payload = rng.integers(0, 256, 256, dtype=np.uint8).tobytes()
                rows.append((i, kind, payload, w, h, nf))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "payload", "width", "height",
                    "n_frames",
                ],
            )

    return spark.range(n).mapInPandas(gen, schema=MEDIA_SCHEMA)
