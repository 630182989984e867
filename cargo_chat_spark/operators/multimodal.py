"""Multimodal column conventions (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode kernels themselves are
STUBBED (no codec libraries in this environment): ``fake=True`` uses a
deterministic byte-statistics kernel so the Spark-side plumbing — schema,
batching, partitioning — is real and testable; ``fake=False`` raises
NotImplementedError where a real libjpeg/ffmpeg call would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_SCHEMA = (
    "media_id bigint, payload binary, media_type string, "
    "meta struct<width:int, height:int, codec:string>"
)

FEATURE_SCHEMA = "media_id bigint, feature array<double>, decode_ok boolean"


def attach_media_columns(df: DataFrame, payload_col: str, media_type: str) -> DataFrame:
    """Wrap a binary column into the media convention with stub metadata."""
    return df.select(
        F.col("media_id"),
        F.col(payload_col).alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit("unknown").alias("codec"),
        ).alias("meta"),
    )


def _decode_features_fn(n_features: int, fake: bool):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires codec libraries (libjpeg/"
                    "ffmpeg) not present in this environment; plug the "
                    "decoder in here"
                )
            feats, ok = [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                if not b:
                    feats.append([0.0] * n_features)
                    ok.append(False)
                    continue
                # deterministic byte-statistics "features": mean byte value
                # per stride bucket — stands in for a decoded-pixel featurizer
                buckets = [[] for _ in range(n_features)]
                for i, byte in enumerate(b):
                    buckets[i % n_features].append(byte)
                feats.append(
                    [ (sum(x) / len(x) / 255.0) if x else 0.0 for x in buckets ]
                )
                ok.append(True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decode_ok": ok,
                }
            )

    return fn


def extract_features(
    media: DataFrame, n_features: int = 8, fake: bool = True
) -> DataFrame:
    """Decode + featurize as a mapInPandas stage (Arrow batches; one
    decoder instance per task)."""
    return media.mapInPandas(_decode_features_fn(n_features, fake), FEATURE_SCHEMA)
