"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

The Spark-side architecture is real and tested — schema, partition-aware
``mapInPandas`` batch shape, Arrow binary transfer, deterministic fake
featurization — while the actual media decode is STUBBED (image/audio
libraries are not in this container): :func:`decode_image` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic hash-derived feature vector stands in for the decoder so
the distributed plumbing (batching, schema, ordering) is exercised
end-to-end.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id string, media_type string, payload binary, width int, height int"
)
FEATURE_DIM = 16


def attach_fake_media(docs: DataFrame) -> DataFrame:
    """Derive a deterministic opaque binary payload + metadata per doc —
    the test stand-in for real image/audio bytes."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.sha2(F.col("doc_id").cast("string"), 256), "UTF-8").alias("payload"),
        (F.pmod(F.xxhash64("doc_id"), F.lit(512)) + 16).cast("int").alias("width"),
        (F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(512)) + 16).cast("int").alias("height"),
    )


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode needs an image library not present here.

    ``fake=True`` returns a deterministic FEATURE_DIM-float vector derived
    from the payload hash — stable across runs/partitions, so tests can
    assert exact values through the full Spark path.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires an image/audio library not available "
            "in this environment; pass fake=True for the deterministic stub"
        )
    h = hashlib.sha256(payload).digest()
    # explicit little-endian: native-endian frombuffer would decode
    # different floats on a big-endian executor (contract: stable
    # across runs, partitions AND platforms)
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype='<u2').astype(np.float64)
    return raw / 65535.0


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Distributed featurization over binary payloads via ``mapInPandas``.

    Batch shape: one Arrow batch in, one out; the decode loop is per-BLOB
    (not per-pixel/per-row of output). Swapping the stub for a real
    decoder changes only :func:`decode_image`.
    """
    import pandas as pd

    def _featurize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # NULL payloads (failed fetch) surface as null features, not
            # a TypeError that kills the whole stage
            feats = [
                None if p is None else decode_image(p, fake=fake).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": feats,
                }
            )

    return media.mapInPandas(
        _featurize,
        schema="doc_id string, media_type string, n_bytes long, features array<double>",
    )


def resize_images(
    media: DataFrame, target_w: int = 224, target_h: int = 224, fake: bool = True
) -> DataFrame:
    """Distributed image resize over binary payloads (``mapInPandas``).

    Real path (STUBBED — no image library here): decode -> resample to
    (target_w, target_h) -> re-encode. The fake path exercises the full
    Spark plumbing with a deterministic payload transform: output bytes =
    sha256(payload || WxH), so schema, metadata propagation and
    per-batch shape are testable end-to-end. Swapping in a real resizer
    changes only ``_resize_one``.
    """
    import pandas as pd

    def _resize_one(payload: bytes) -> bytes:
        if not fake:
            raise NotImplementedError(
                "image resize requires an image library not available in "
                "this environment; pass fake=True for the deterministic stub"
            )
        tag = f"{target_w}x{target_h}".encode()
        return hashlib.sha256(payload + tag).digest()

    def _resize(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "payload": [_resize_one(p) for p in pdf["payload"]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.mapInPandas(_resize, schema=MEDIA_SCHEMA)


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 8, fake: bool = True
) -> DataFrame:
    """Video frame sampling: one output row PER SAMPLED FRAME (a
    one-to-many ``mapInPandas``, the flatMap shape real video pipelines
    need). Frame count derives deterministically from the payload; each
    fake frame's payload is sha256(payload || frame_idx). Output:
    ``(doc_id, frame_idx, frame_payload)``.
    """
    import pandas as pd

    def _sample(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids, idxs, frames = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if not fake:
                    raise NotImplementedError(
                        "frame extraction requires a video library not "
                        "available here; pass fake=True for the stub"
                    )
                if payload is None or len(payload) == 0:
                    # a null/zero-byte payload has no frames — skip it
                    # rather than IndexError the whole stage
                    continue
                n_total = (payload[0] % 100) + 1  # deterministic "video length"
                sampled = list(range(0, n_total, every_n))[:max_frames]
                for i in sampled:
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(
                        hashlib.sha256(payload + i.to_bytes(4, "little")).digest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return media.mapInPandas(
        _sample, schema="doc_id string, frame_idx int, frame_payload binary"
    )
