"""Multimodal (image/audio/video) column plumbing.

Media travels as opaque ``binary`` columns plus typed metadata structs —
the only layout that scales: bytes stay columnar in parquet/Arrow, no
JVM object blowup, and partition sizing is driven by byte size, not row
count. Decode/feature kernels run as Arrow-batched ``mapInPandas`` so
each Python worker touches a whole batch of byte buffers at once.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
``decode_image`` raises unless given ``fake=True``, which produces a
deterministic metadata-shaped feature row — the Spark-side contract
(schemas, batching, partitioning) is real and tested; the kernel body
is the only stub.  Reference parity note: the reference has no media
handling at all; this is north-star surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, sha256 string, "
    "feature array<float>"
)


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Stub decode: real pipelines plug PIL/torchvision here."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not available in this environment; "
            "pass fake=True for the deterministic test kernel"
        )
    # Deterministic 8-dim 'feature': normalized bytes of the sha256 digest.
    digest = hashlib.sha256(payload).digest()[:8]
    return [b / 255.0 for b in digest]


def extract_features(media: DataFrame, fake: bool = True, batch_rows: int = 1024) -> DataFrame:
    """binary → feature vectors via Arrow-batched mapInPandas.

    Partitioning contract: upstream should repartition by byte volume
    (``repartitionByRange`` on a size column) so one straggler video
    doesn't serialize a whole partition's decode.
    """

    def _kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                    "feature": pdf["payload"].map(
                        lambda b: decode_image(bytes(b), fake=fake)
                    ),
                }
            )
            yield out

    return media.mapInPandas(_kernel, schema=FEATURE_SCHEMA)


def media_from_text(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Test fixture builder: wrap a text column as a binary media table
    (the container ships no real media, so bytes come from utf-8 text)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("text/fake").alias("kind"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
