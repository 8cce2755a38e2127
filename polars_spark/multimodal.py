"""Multimodal (image/audio/video) column support: opaque binary payloads +
typed metadata, processed with Arrow-batched mapInPandas.

Design (SURVEY-adjacent; the reference has no multimodal surface — this is
the training-data-pipeline extension the brief asks for):

- Media travels as a ``binary`` column next to typed metadata
  (width/height/codec/duration), exactly how parquet stores it at 100 TB:
  the bytes never pass through the driver, and column pruning means scans
  that don't touch pixels never read them.
- decode / feature-extract / resize / frame-sample are ``mapInPandas``
  stages: Arrow batches in, Arrow batches out, numpy inside.  Real codecs
  (PIL/ffmpeg) are NOT in this image, so ``decode_image`` raises
  NotImplementedError with the integration point documented, and
  ``extract_features`` ships a clearly-marked DETERMINISTIC FAKE decoder
  (byte-histogram features) so the Spark-side plumbing — schema, batching,
  partitioning — is real and testable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_fake_image_bytes", "decode_image", "extract_features", "sample_frames"]

FEATURE_DIM = 16


def attach_fake_image_bytes(df: DataFrame, text_col: str, out_col: str = "image") -> DataFrame:
    """Stand-in media payload: the utf-8 bytes of a text column as `binary`,
    plus the metadata columns a real ingest would carry."""
    return (
        df.withColumn(out_col, F.encode(F.col(text_col), "utf-8"))
        .withColumn("media_type", F.lit("image/fake"))
        .withColumn("media_bytes", F.octet_length(F.col(out_col)))
    )


def decode_image(df: DataFrame, binary_col: str = "image"):
    """Real image decode requires a codec library on the executors (PIL /
    turbojpeg), which this container does not ship.  Integration point: a
    mapInPandas stage identical in shape to ``extract_features`` below,
    decoding each `bytes` value to HxWxC uint8."""
    raise NotImplementedError(
        "no image codec in this environment; see extract_features for the "
        "mapInPandas plumbing a real decoder plugs into"
    )


def extract_features(df: DataFrame, binary_col: str = "image", dim: int = FEATURE_DIM) -> DataFrame:
    """FAKE-decoder feature extraction (clearly marked): a deterministic
    byte-histogram 'embedding' per media payload.  Everything around the
    fake decode — Arrow batch transfer, output schema, per-partition
    execution — is exactly what a real CLIP/ResNet featurizer uses."""
    import numpy as np
    import pandas as pd

    other = [c for c in df.columns if c != binary_col]
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name != binary_col)
    schema += f", features array<float>"

    def gen(batches):
        for pdf in batches:
            feats = []
            for payload in pdf[binary_col]:
                if payload is None:
                    feats.append(None)
                    continue
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                hist, _ = np.histogram(arr, bins=dim, range=(0, 256))
                total = hist.sum() or 1
                feats.append((hist / total).astype("float32"))
            out = pdf[other].copy()
            out["features"] = feats
            yield out

    return df.mapInPandas(gen, schema)


def sample_frames(df: DataFrame, binary_col: str = "video", every_n: int = 10):
    """Frame sampling for video payloads — same integration point as
    decode_image (ffmpeg on executors); not available in this container."""
    raise NotImplementedError("no video codec in this environment")
