"""Multimodal column plumbing: opaque binary payloads + typed metadata.

North-star component (BASELINE.json): image/audio/video travel as
``binary`` columns with typed metadata; decode / feature-extract runs
as Arrow-batched ``mapInPandas`` so bytes stream through Python in
columnar batches (never row-at-a-time py4j).

The container has no image/audio libraries, so the *decode step* is
STUBBED with a deterministic fake (documented below); everything
Spark-side — schema, batch iteration, partitioning, UDF signature — is
real and tested. Swap ``_decode_image_stub`` for a PIL/libav call and
nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Output schema of the decode stage — what a real image decoder yields.
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def with_blob(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + mime column.

    Test stand-in: the UTF-8 bytes of the text play the role of the
    media payload (the real pipeline reads bytes from parquet/blob
    storage the same way — an opaque BinaryType column).
    """
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("image/fake").alias("mime"),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder — deterministic fake metadata from the byte length.

    A real deployment replaces this with e.g. ``PIL.Image.open`` /
    pyav frame probing. Raising NotImplementedError here would kill the
    plumbing test, so the stub returns a stable function of len(bytes).
    """
    n = len(payload)
    return 64 + n % 512, 64 + (7 * n) % 512, 1 + n % 4


def decode_meta(blobs: DataFrame) -> DataFrame:
    """Decode binary payloads → typed metadata via ``mapInPandas``.

    Batch shape: the iterator yields one output frame per Arrow batch;
    memory stays bounded by the Arrow batch size regardless of table
    size — the pattern that scales to billions of media blobs.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = pdf["content"].map(_decode_image_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": pdf["content"].map(len),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "n_frames": decoded.map(lambda t: t[2]),
                }
            )

    assert isinstance(blobs.schema["content"].dataType, BinaryType)
    return blobs.mapInPandas(decode_batches, DECODE_SCHEMA)


def multimodal_decode(documents: DataFrame) -> DataFrame:
    """documents → blob column → stub-decoded metadata (end-to-end)."""
    return decode_meta(with_blob(documents))
