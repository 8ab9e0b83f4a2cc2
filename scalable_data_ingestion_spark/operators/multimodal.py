"""Multimodal column plumbing: binary payloads + typed metadata
(north-star LLM pipeline surface, SURVEY.md §7 step 8).

Images/audio/video are opaque ``binary`` columns with a typed metadata
struct. The Spark-side plumbing — schema, partition-friendly layout,
Arrow-batched UDF signatures, batch iteration shape — is real and
tested; the actual codec calls are STUBBED (this container has no
image/audio libraries): ``decode_fn`` raises NotImplementedError unless
given a decoder, and the default test path uses a deterministic fake
extractor so the pipeline is exercisable end to end.

Scale notes (100 TB of media):
- payloads travel as Arrow binary batches through mapInPandas — one
  python worker round-trip per batch, never per row;
- metadata-only queries (filtering by mime/size/dims) never touch the
  payload column thanks to parquet column pruning;
- feature extraction emits fixed-width vectors -> downstream joins/ANN
  reuse the similarity operators.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("mime", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def synthetic_media(spark: SparkSession, n: int = 100) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata
    consistent with the payload (stands in for real image/audio files)."""
    df = spark.range(n).select(F.col("id").alias("media_id"))
    payload = F.encode(
        F.concat(F.lit("MEDIA:"), F.lpad(F.col("media_id").cast("string"), 12, "0")),
        "utf-8",
    )
    mime = F.when(F.col("media_id") % 3 == 0, "image/png").otherwise("image/jpeg")
    return df.select(
        "media_id",
        payload.alias("payload"),
        F.struct(
            mime.alias("mime"),
            ((F.col("media_id") % 16 + 1) * 64).cast("int").alias("width"),
            ((F.col("media_id") % 9 + 1) * 64).cast("int").alias("height"),
            F.length(payload).cast("bigint").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder+embedder: bytes -> 8
    floats from a rolling byte sum (stable across engines/runs)."""
    acc = [0.0] * FEATURE_DIM
    for i, b in enumerate(payload):
        acc[i % FEATURE_DIM] += (b % 97) / 97.0
    return [round(v, 6) for v in acc]


def stub_decoder(payload: bytes) -> bytes:
    """The real codec boundary. Container has no media libs (SURVEY.md
    build constraints): decoding is explicitly not implemented."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "environment; pass decode_fn=... to extract_features"
    )


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], list[float]] | None = None,
    batch_size_hint: int = 1024,
) -> DataFrame:
    """Arrow-batched feature extraction via mapInPandas.

    ``decode_fn``: bytes -> fixed-width feature vector. Defaults to the
    deterministic fake so the plumbing is testable; a real deployment
    passes the actual decode+embed closure.
    """
    fn = decode_fn or _fake_features

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": [m["mime"] if m is not None else None for m in pdf["meta"]],
                    "feature": [fn(bytes(p)) for p in pdf["payload"]],
                }
            )
            yield out

    return media.mapInPandas(_extract, FEATURES_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregate — never reads the payload column (check
    the scan's ReadSchema: payload must be absent)."""
    return media.groupBy(F.col("meta.mime").alias("mime")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("meta.n_bytes").alias("total_bytes"),
        F.round(F.avg(F.col("meta.width") * F.col("meta.height")), 2).alias("avg_pixels"),
    )
