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
    raw = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16).astype(np.float64)
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
            feats = [decode_image(p, fake=fake).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["payload"].map(len),
                    "features": feats,
                }
            )

    return media.mapInPandas(
        _featurize,
        schema="doc_id string, media_type string, n_bytes long, features array<double>",
    )
