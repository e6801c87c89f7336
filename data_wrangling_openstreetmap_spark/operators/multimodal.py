"""Multimodal binary-column plumbing (SURVEY.md §2.10 L5 extension).

Images/audio/video ride DataFrames as opaque ``binary`` payloads plus a
typed metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched Pandas functions over ``mapInPandas``. The decode
libraries (Pillow/ffmpeg/torchaudio) are not in this container, so the
codec step is STUBBED: ``decode_image_bytes`` raises
``NotImplementedError`` and the registered query uses a deterministic
fake decoder instead — the Spark-side contract (schema, batching,
partitioning, UDF signature) is real and tested.

Scale: mapInPandas streams Arrow record batches through one Python
worker per core — no collect, no driver involvement; binary columns are
never shuffled here (decode before any groupBy so only small extracted
features ride the exchange). Batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import register

if TYPE_CHECKING:
    import pandas as pd

DECODED_SCHEMA = (
    "doc_id bigint, mime string, n_bytes int, width int, height int, checksum bigint"
)


def decode_image_bytes(payload: bytes) -> dict:
    """Real codec hook — requires an image library not present in this
    environment. Swap in Pillow/libvips when deployable."""
    raise NotImplementedError(
        "image decoding requires Pillow/libvips; use fake_decode_batch for "
        "the deterministic test double"
    )


def fake_decode_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Deterministic stand-in decoder: derives fake image dimensions and
    a checksum purely from the payload bytes, preserving the exact
    Arrow-batch iterator shape a real decoder would use."""
    import pandas as pd
    import zlib

    for pdf in batches:
        raw = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": pdf["mime"],
                "n_bytes": raw.map(len).astype("int32"),
                "width": raw.map(lambda b: 64 + len(b) % 512).astype("int32"),
                "height": raw.map(lambda b: 64 + (len(b) * 7) % 512).astype("int32"),
                "checksum": raw.map(lambda b: zlib.crc32(b)).astype("int64"),
            }
        )


@register("m1_multimodal_decode", oracle=None, tags=("L5", "U3"))
def m1_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline: pack each document's text as a
    binary payload (the fixture has no real image column), then extract
    typed metadata via mapInPandas with the production batch shape.

    Rows-only graded (codec output isn't SQL-expressible); determinism
    and schema are unit-tested.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/x-fake-image").alias("mime"),
    )
    return payload.mapInPandas(fake_decode_batch, DECODED_SCHEMA)
