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

from pyspark.sql import DataFrame, SparkSession, Window
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
    and schema are unit-tested. Oracle conversion CLOSED (VERDICT r7
    §Next #6): the checksum is zlib.crc32, which has no DuckDB image;
    the crc-free parity twin m5 carries the full cross-engine grade.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/x-fake-image").alias("mime"),
    )
    return payload.mapInPandas(fake_decode_batch, DECODED_SCHEMA)


# ---------------------------------------------------------------------------
# m2 — video-style frame sampling: one binary payload → N frame rows.
# ---------------------------------------------------------------------------

FRAME_SCHEMA = (
    "doc_id bigint, frame_idx int, frame_ts_ms int, frame_bytes binary, frame_checksum bigint"
)

# Deterministic sampling policy: every ~5th "frame" of a fake 25-frame
# payload, i.e. the stride a real pipeline would pass to the demuxer.
FRAME_STRIDE = 5
FAKE_TOTAL_FRAMES = 25
FAKE_FRAME_MS = 40  # 25 fps


def extract_frames(payload: bytes) -> list[bytes]:
    """Real demux hook — requires ffmpeg/pyav, absent in this
    container. Swap in when deployable."""
    raise NotImplementedError(
        "frame extraction requires ffmpeg/pyav; use fake_frame_sample_batch "
        "for the deterministic test double"
    )


def fake_frame_sample_batch(batches):
    """Deterministic stand-in demuxer: slices the payload into
    FAKE_TOTAL_FRAMES byte windows and emits every FRAME_STRIDE-th one,
    preserving the 1→N Arrow-batch fan-out shape (one input row yields
    several frame rows inside the same batch) of a real frame sampler."""
    import zlib

    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "frame_ts_ms": [], "frame_bytes": [], "frame_checksum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            window = max(1, len(payload) // FAKE_TOTAL_FRAMES)
            for idx in range(0, FAKE_TOTAL_FRAMES, FRAME_STRIDE):
                frame = payload[idx * window : (idx + 1) * window]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["frame_ts_ms"].append(idx * FAKE_FRAME_MS)
                out["frame_bytes"].append(frame)
                out["frame_checksum"].append(zlib.crc32(frame))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_ts_ms": pd.Series(out["frame_ts_ms"], dtype="int32"),
                "frame_bytes": out["frame_bytes"],
                "frame_checksum": pd.Series(out["frame_checksum"], dtype="int64"),
            }
        )


@register("m2_frame_sample", oracle=None, tags=("L5", "U3"))
def m2_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling pipeline: each document's payload (standing in for
    a video blob) fans out to every 5th frame as its own row with a
    timestamp and checksum — the shape a training pipeline feeds to a
    vision encoder. Rows-only graded; determinism, fan-out cardinality
    (5 frames/doc), and schema are unit-tested. Oracle conversion
    CLOSED (VERDICT r7 §Next #6): the frame checksum is zlib.crc32 (no
    DuckDB image); the crc-free twin m2b carries the full grade.

    Scale: mapInPandas streams batches worker-parallel and the 1→N
    fan-out happens inside the Python worker — no explode-shuffle of
    binary data; downstream ops should aggregate frame features before
    any exchange so blobs never ride a shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payload.mapInPandas(fake_frame_sample_batch, FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# m3 — image resize: decode → scale-to-target metadata, batch shape real.
# ---------------------------------------------------------------------------

RESIZE_SCHEMA = (
    "doc_id bigint, in_width int, in_height int, out_width int, out_height int, "
    "scale_num int, resized_checksum bigint"
)

TARGET_EDGE = 224  # the ubiquitous vision-encoder input edge


def resize_image_bytes(payload: bytes, edge: int) -> bytes:
    """Real resample hook — requires Pillow/libvips, absent here."""
    raise NotImplementedError(
        "image resizing requires Pillow/libvips; use fake_resize_batch for "
        "the deterministic test double"
    )


def fake_resize_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Deterministic stand-in resizer: derives input dims exactly as the
    fake decoder does, 'resizes' the longer edge to TARGET_EDGE
    preserving aspect ratio in integer arithmetic, and checksums a
    deterministic byte slice standing in for the resampled pixels."""
    import zlib

    import pandas as pd

    for pdf in batches:
        raw = pdf["payload"]
        in_w = raw.map(lambda b: 64 + len(b) % 512).astype("int32")
        in_h = raw.map(lambda b: 64 + (len(b) * 7) % 512).astype("int32")
        long_edge = pd.concat([in_w, in_h], axis=1).max(axis=1)
        # integer rescale: out = dim * TARGET // long_edge (exact, no fp)
        out_w = (in_w * TARGET_EDGE // long_edge).astype("int32")
        out_h = (in_h * TARGET_EDGE // long_edge).astype("int32")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "in_width": in_w,
                "in_height": in_h,
                "out_width": out_w,
                "out_height": out_h,
                "scale_num": long_edge.astype("int32"),
                "resized_checksum": raw.map(
                    lambda b: zlib.crc32(b[: max(1, len(b) // 4)])
                ).astype("int64"),
            }
        )


@register("m3_image_resize", oracle=None, tags=("L5", "U3"))
def m3_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage of the multimodal pipeline: longer edge to 224 px,
    aspect preserved, computed per Arrow batch in the Python worker —
    the step between decode (m1) and feature extraction (m4). The
    rescale math is exact integer arithmetic so the stage is
    deterministic without any float tolerance. Rows-only graded;
    determinism, aspect-ratio preservation, and schema are unit-tested.
    Oracle conversion CLOSED (VERDICT r7 §Next #6): the payload
    checksum is zlib.crc32 (no DuckDB image); the integer rescale math
    itself is fully covered by the graded m-pipeline parity twins.

    Scale: like m1 — worker-parallel projection, binary never shuffled;
    at 100 TB the only knob is arrow.maxRecordsPerBatch vs payload size.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select("doc_id", F.encode(F.col("text"), "utf-8").alias("payload"))
    return payload.mapInPandas(fake_resize_batch, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# m4 — feature extraction: payload → fixed-width feature vector, then
# JVM-side vector math over the extracted column (the hybrid hot path).
# ---------------------------------------------------------------------------

FEATURE_DIM = 8

FEATURE_SCHEMA = "doc_id bigint, feat array<float>"


def extract_features(payload: bytes) -> list[float]:
    """Real encoder hook — a vision/audio model, absent here."""
    raise NotImplementedError(
        "feature extraction requires a model runtime; use "
        "fake_feature_batch for the deterministic test double"
    )


def fake_feature_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Deterministic stand-in encoder: an 8-bin byte histogram of the
    payload, L1-normalized — a real feature vector's shape and dtype
    (array<float>) with trivially reproducible values."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        feats = []
        for payload in pdf["payload"]:
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            hist = np.bincount(arr >> 5, minlength=FEATURE_DIM).astype("float64")
            total = hist.sum()
            feats.append((hist / total if total else hist).astype("float32"))
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "feat": feats})


@register("m4_feature_extract", oracle=None, tags=("L5", "U3", "L6"))
def m4_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-extraction stage: Python worker emits an array<float>
    feature column (8-bin byte histogram as the model stand-in), and the
    rest of the query is JVM-side vector math over that column — norm
    via higher-order aggregate and a per-language centroid distance —
    proving extracted features are first-class citizens of the
    relational layer (the m-pipeline's hand-off to L6 embedding math).

    Output is scalar-only (dim, norm, checksum of rounded components):
    the array itself stays internal so any grading path can hash rows.
    Oracle conversion CLOSED (VERDICT r7 §Next #6): the component
    checksum is zlib.crc32 (no DuckDB image); the crc-free twin m4b
    carries the full cross-engine grade of the same vector math.

    Scale: one Python crossing for the encode, then everything is
    codegen; features (32 B/row here) ride shuffles, payloads never do.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = payload.mapInPandas(fake_feature_batch, FEATURE_SCHEMA)
    vec = F.col("feat").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.zip_with(vec, vec, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return feats.select(
        "doc_id",
        F.size("feat").alias("feat_dim"),
        F.round(norm, 6).alias("feat_norm"),
        F.xxhash64(
            F.concat_ws(
                ",", F.transform(vec, lambda x: F.round(x, 4).cast("string"))
            )
        ).alias("feat_checksum"),
    )


# ---------------------------------------------------------------------------
# m5 — the graded parity form of the m-pipeline: every metadata column
# the fake codec derives with integer arithmetic (decode dims + resize
# dims) is recomputed by DuckDB from octet_length alone, so the oracle
# grades the REAL Arrow/mapInPandas crossing — batch iteration, dtype
# mapping, schema — value-by-value. Only the checksums (zlib.crc32, not
# in DuckDB) stay rows-only with m1–m3.
# ---------------------------------------------------------------------------

M5_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, out_width int, out_height int"
)

_M5_ORACLE = """
WITH b AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         64 + octet_length(encode(text)) % 512 AS w,
         64 + (octet_length(encode(text)) * 7) % 512 AS h
  FROM documents
)
SELECT doc_id, n AS n_bytes, w AS width, h AS height,
       w * 224 // greatest(w, h) AS out_width,
       h * 224 // greatest(w, h) AS out_height
FROM b
"""


def _decode_resize_batch(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
    """Fake decode + resize metadata in one Arrow pass (the checksum-free
    projection of fake_decode_batch ∘ fake_resize_batch)."""
    import pandas as pd

    for pdf in batches:
        raw = pdf["payload"]
        n = raw.map(len).astype("int32")
        in_w = (64 + n % 512).astype("int32")
        in_h = (64 + (n * 7) % 512).astype("int32")
        long_edge = pd.concat([in_w, in_h], axis=1).max(axis=1)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n,
                "width": in_w,
                "height": in_h,
                "out_width": (in_w * TARGET_EDGE // long_edge).astype("int32"),
                "out_height": (in_h * TARGET_EDGE // long_edge).astype("int32"),
            }
        )


@register("m5_decode_parity", oracle=_M5_ORACLE, tags=("L5", "U3"))
def m5_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-graded multimodal metadata: the fake decoder's dimension
    math (m1) and the integer resize (m3) run through the REAL
    mapInPandas pipeline, and DuckDB re-derives every output from
    octet_length in pure SQL — a cross-engine check that the Arrow
    batch crossing preserves values and dtypes exactly.

    Scale: identical plan shape to m1/m3 (worker-parallel projection,
    binary never shuffled); this query exists so the driver can grade
    that shape, not just trust the goldens.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    return payload.mapInPandas(_decode_resize_batch, M5_SCHEMA)


# ---------------------------------------------------------------------------
# m2b/m4b — parity companions for the remaining rows-only m-stages
# (VERDICT r2 #6): every integer/float output the fake codecs derive is
# re-derived by DuckDB from octet_length / per-character arithmetic, so
# the REAL Arrow crossings (m2's 1→N fan-out, m4's array<float> encode)
# are value-hash-graded, not just row-counted. With m5 covering m1/m3,
# no m-stage now relies solely on a rows-only check — only the zlib
# checksums (no DuckDB equivalent) stay ungraded.
# ---------------------------------------------------------------------------

_M2B_ORACLE = f"""
WITH d AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n,
         GREATEST(1, octet_length(encode(text)) // {FAKE_TOTAL_FRAMES}) AS w
  FROM documents
)
SELECT d.doc_id,
       CAST(k.k AS INT) AS frame_idx,
       CAST(k.k * {FAKE_FRAME_MS} AS INT) AS frame_ts_ms,
       CAST(LEAST(n, (k.k + 1) * w) - LEAST(n, k.k * w) AS INT) AS frame_len
FROM d, (SELECT unnest(generate_series(0, {FAKE_TOTAL_FRAMES - 1},
                                       {FRAME_STRIDE})) AS k) k
"""


@register("m2b_frame_parity", oracle=_M2B_ORACLE, tags=("L5", "U3"))
def m2b_frame_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-graded frame sampling: m2's REAL mapInPandas demux double
    (1 payload → 5 frame rows) runs unchanged, and DuckDB re-derives
    every frame's index, timestamp, and byte length from octet_length
    alone (slice length = clip(stop) − clip(start), exactly Python's
    slicing rule) — so the fan-out cardinality, ordering metadata, and
    per-frame byte accounting of the Arrow crossing are all
    hash-graded. Only the crc32 frame checksum stays rows-only (m2).

    Scale: identical plan to m2 — worker-parallel, binary never
    shuffled; the graded projection drops frame_bytes before any
    exchange.
    """
    frames = m2_frame_sample(spark, sf_dir)
    return frames.select(
        "doc_id",
        "frame_idx",
        "frame_ts_ms",
        F.length("frame_bytes").cast("int").alias("frame_len"),
    )


_M4B_ORACLE = """
WITH chars AS (
  SELECT doc_id, ascii(unnest(string_to_array(text, ''))) // 32 AS bin
  FROM documents
),
hist AS (
  SELECT doc_id, bin, COUNT(*) AS c FROM chars GROUP BY doc_id, bin
),
tot AS (SELECT doc_id, length(text) AS n FROM documents),
f AS (
  SELECT t.doc_id,
         (CAST(COALESCE(h.c, 0) AS DOUBLE) / t.n)::REAL AS fv
  FROM tot t
  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS bin) b
  LEFT JOIN hist h ON h.doc_id = t.doc_id AND h.bin = b.bin
)
SELECT doc_id,
       8 AS feat_dim,
       ROUND(SUM(CAST(fv AS DOUBLE)), 6) AS feat_l1,
       ROUND(SQRT(SUM(CAST(fv AS DOUBLE) * CAST(fv AS DOUBLE))), 6) AS feat_norm
FROM f
GROUP BY doc_id
"""


@register("m4b_feature_parity", oracle=_M4B_ORACLE, tags=("L5", "U3", "L6"))
def m4b_feature_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-graded feature extraction: m4's REAL encoder double (8-bin
    byte histogram, L1-normalized float32) runs through the actual
    mapInPandas crossing, and DuckDB recomputes the same vector from
    per-character arithmetic — valid because the fixture corpus is pure
    ASCII (byte == codepoint; asserted in tests), so ascii(ch) // 32
    reproduces byte >> 5 exactly. Both engines divide in double and
    round through REAL/float32 (double-rounding is exact at these
    magnitudes), then the L1 and L2 norms round at 6 dp — grading the
    array<float> dtype mapping across the Arrow boundary value-by-value.

    Scale: same plan as m4 — one Python crossing, 32 B/row features,
    payloads never shuffled.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    feats = payload.mapInPandas(fake_feature_batch, FEATURE_SCHEMA)
    vec = F.col("feat").cast("array<double>")
    l1 = F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x)
    l2 = F.sqrt(
        F.aggregate(
            F.zip_with(vec, vec, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return feats.select(
        "doc_id",
        F.lit(8).alias("feat_dim"),
        F.round(l1, 6).alias("feat_l1"),
        F.round(l2, 6).alias("feat_norm"),
    )


# ---------------------------------------------------------------------------
# m0 — binaryFile INGEST: how blobs enter the pipeline in the first
# place. Spark's `binaryFile` format reads whole files as (path,
# modificationTime, length, content) rows — the front door for image /
# audio / video corpora before m1's decode. Staged here from a small
# deterministic document sample (the fixture ships no real blob files).
# ---------------------------------------------------------------------------

_M0_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS file_len,
       n_chars
FROM documents
WHERE doc_id % 50 = 0
"""


@register("m0_binary_ingest", oracle=_M0_ORACLE, tags=("L5", "S1"))
def m0_binary_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile-source ingest: every 50th document's payload staged
    as an individual `.bin` file, read back through
    ``spark.read.format("binaryFile")``, the doc id recovered from the
    filename, and the blob length joined against the catalog's
    n_chars — the arrival pattern of a real image/audio corpus (one
    object per file) with the catalog join that every multimodal
    pipeline does first. Staging writes the bounded sample
    driver-side (it IS the external filesystem here); the graded path
    — scan, filename parse, length accounting, catalog join — is all
    executors.

    Scale: binaryFile scans parallelize per file and never split one
    blob across tasks; `pathGlobFilter`/`recursiveFileLookup` handle
    object-store layouts, and the catalog join broadcasts the metadata
    side. The oracle grades length-vs-catalog agreement end to end.
    """
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    sample = docs.filter(F.col("doc_id") % 50 == 0).select("doc_id", "text")
    stage = tempfile.mkdtemp(prefix="dwos_m0_") + "/blobs"
    os.makedirs(stage, exist_ok=True)
    for r in sample.collect():  # bounded staging: |docs|/50 small files
        with open(os.path.join(stage, f"{r.doc_id}.bin"), "wb") as fh:
            fh.write(r.text.encode("utf-8"))
    blobs = spark.read.format("binaryFile").load(stage)
    parsed = blobs.select(
        F.regexp_extract(F.col("path"), r"(\d+)\.bin\z", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("file_len"),
    )
    meta = docs.select("doc_id", "n_chars")
    return parsed.join(F.broadcast(meta), "doc_id").select(
        "doc_id", "file_len", "n_chars"
    )


# ---------------------------------------------------------------------------
# m6 — scene-cut detection: the first TEMPORAL multimodal operator —
# per-frame features from the (fake) decoder, then a lag window over
# frame order flags cuts where the feature jumps. The decode runs in
# Arrow batches; the temporal logic is plain JVM windowing, which is
# the point: frames become rows and the engine's window machinery IS
# the video toolkit.
# ---------------------------------------------------------------------------

SCENE_SCHEMA = "doc_id bigint, frame_idx int, fsum bigint"
SCENE_CUT_THRESHOLD = 150


def fake_scene_frames_batch(batches):
    """Stride-1 twin of fake_frame_sample_batch emitting one byte-sum
    feature per frame — the deterministic stand-in for a per-frame
    embedding, value-gradable because it is pure byte arithmetic."""
    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "fsum": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            window = max(1, len(payload) // FAKE_TOTAL_FRAMES)
            for idx in range(FAKE_TOTAL_FRAMES):
                frame = payload[idx * window : (idx + 1) * window]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["fsum"].append(sum(frame))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "fsum": pd.Series(out["fsum"], dtype="int64"),
            }
        )


_M6_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, greatest(1, length(text) // {FAKE_TOTAL_FRAMES}) AS w
  FROM documents
),
fr AS (
  SELECT doc_id, i AS frame_idx,
         COALESCE(list_sum(list_transform(
           string_split(substring(text, i * w + 1, w), ''),
           c -> ascii(c))), 0) AS fsum
  FROM t, (SELECT unnest(generate_series(0, {FAKE_TOTAL_FRAMES - 1})) AS i) g(i)
),
d AS (
  SELECT doc_id, frame_idx,
         abs(fsum - lag(fsum) OVER (PARTITION BY doc_id ORDER BY frame_idx))
           AS jump
  FROM fr
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(CASE WHEN jump >= {SCENE_CUT_THRESHOLD} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_cuts,
       CAST(COALESCE(MAX(jump), 0) AS BIGINT) AS max_jump,
       CAST(COALESCE(MIN(CASE WHEN jump >= {SCENE_CUT_THRESHOLD}
                              THEN frame_idx END), -1) AS BIGINT)
         AS first_cut_idx
FROM d GROUP BY doc_id
"""


@register("m6_scene_cuts", oracle=_M6_ORACLE, tags=("L5", "U2", "W3"))
def m6_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over the fake-decoded frame stream: every
    payload demuxes to 25 frame rows with a byte-sum feature (Arrow
    mapInPandas — the decode stage), then a lag window per document
    flags frames whose feature jumps >= 150 from the previous one.
    Graded per document (frame count, cut count, peak jump, first cut
    index) against the oracle's re-derivation of the same byte
    arithmetic from the text — exact integers end to end (m4b's ASCII
    precondition applies and is test-pinned there).

    Scale: decode-before-shuffle (frames fan out inside the Python
    worker; only (doc_id, idx, fsum) — 20 bytes/frame, not the frame
    bytes — ride the lag shuffle), and the window partitions by
    doc_id with a FIXED 25-row partition. A real pipeline swaps the
    byte-sum for a CLIP-embedding distance; the plan is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    frames = payload.mapInPandas(fake_scene_frames_batch, SCENE_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("frame_idx")
    d = frames.withColumn(
        "jump", F.abs(F.col("fsum") - F.lag("fsum").over(w))
    )
    return d.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum(
            F.when(F.col("jump") >= SCENE_CUT_THRESHOLD, 1).otherwise(0)
        ).alias("n_cuts"),
        F.coalesce(F.max("jump"), F.lit(0)).alias("max_jump"),
        F.coalesce(
            F.min(
                F.when(
                    F.col("jump") >= SCENE_CUT_THRESHOLD, F.col("frame_idx")
                )
            ),
            F.lit(-1),
        )
        .cast("long")
        .alias("first_cut_idx"),
    )


# ---------------------------------------------------------------------------
# m7 — audio VAD: the audio-modality stage (m2/m6 cover video, m3/m4
# images): fake-PCM frames with an energy gate, then gaps-and-islands
# over the voiced flags — frame the waveform in Arrow, segment with
# JVM windows.
# ---------------------------------------------------------------------------

VAD_SCHEMA = "doc_id bigint, frame_idx int, energy bigint"
VAD_FRAME_BYTES = 40  # "samples" per frame
VAD_ENERGY_THRESHOLD = 400_000  # Σ sample² gate per frame


def fake_pcm_frames_batch(batches):
    """Deterministic stand-in decoder: the payload bytes ARE the PCM
    samples; frames are fixed windows with Σ sample² energy — pure byte
    arithmetic, so the whole stage is oracle-expressible."""
    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "frame_idx": [], "energy": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = max(1, len(payload) // VAD_FRAME_BYTES)
            for idx in range(n_frames):
                frame = payload[idx * VAD_FRAME_BYTES : (idx + 1) * VAD_FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(idx)
                out["energy"].append(sum(b * b for b in frame))
        yield pd.DataFrame(
            {
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "energy": pd.Series(out["energy"], dtype="int64"),
            }
        )


_M7_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text,
         greatest(1, length(text) // {VAD_FRAME_BYTES}) AS n_frames
  FROM documents
),
fr AS (
  SELECT doc_id, i AS frame_idx,
         COALESCE(list_sum(list_transform(
           string_split(substring(text, i * {VAD_FRAME_BYTES} + 1,
                                  {VAD_FRAME_BYTES}), ''),
           c -> ascii(c) * ascii(c))), 0) AS energy
  FROM t, LATERAL (SELECT unnest(generate_series(0, n_frames - 1)) AS i) g(i)
),
v AS (
  SELECT doc_id, frame_idx,
         CASE WHEN energy >= {VAD_ENERGY_THRESHOLD} THEN 1 ELSE 0 END AS voiced
  FROM fr
),
runs AS (
  SELECT doc_id, frame_idx, voiced,
         frame_idx - row_number() OVER (
           PARTITION BY doc_id, voiced ORDER BY frame_idx
         ) AS island
  FROM v
),
seg AS (
  SELECT doc_id, voiced, island, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM runs GROUP BY 1, 2, 3
)
SELECT v.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_frames,
       CAST(SUM(voiced) AS BIGINT) AS n_voiced,
       CAST(COALESCE((SELECT MAX(run_len) FROM seg s
                      WHERE s.doc_id = v.doc_id AND s.voiced = 1), 0)
            AS BIGINT) AS longest_voiced_run
FROM v GROUP BY v.doc_id
"""


@register("m7_audio_vad", oracle=_M7_ORACLE, tags=("L5", "U2", "W1"))
def m7_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity detection on the fake-PCM stream: payload bytes
    frame into 40-sample windows with Σ sample² energy (Arrow
    mapInPandas — the decode/framing stage), a threshold gates each
    frame voiced/unvoiced, and the classic gaps-and-islands window
    (w15's recipe) finds each document's longest voiced run — the
    segment boundaries an ASR pipeline would cut clips at. Exact
    integers end to end (m4b's ASCII precondition), so the audio
    stage is value-graded like every other m-stage.

    Scale: framing fans out inside the Python worker and only
    (doc_id, idx, energy) rides the shuffle — never the samples; the
    island detection is one partitioned window per document with
    frame counts bounded by clip length. A real pipeline swaps byte
    energy for RMS-over-int16 and the threshold for a learned gate;
    the plan is identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )
    frames = payload.mapInPandas(fake_pcm_frames_batch, VAD_SCHEMA)
    voiced = frames.select(
        "doc_id",
        "frame_idx",
        (F.col("energy") >= VAD_ENERGY_THRESHOLD).cast("int").alias("voiced"),
    )
    w_isl = Window.partitionBy("doc_id", "voiced").orderBy("frame_idx")
    runs = voiced.withColumn(
        "island", F.col("frame_idx") - F.row_number().over(w_isl)
    )
    seg = runs.groupBy("doc_id", "voiced", "island").agg(
        F.count("*").alias("run_len")
    )
    longest = (
        seg.filter(F.col("voiced") == 1)
        .groupBy("doc_id")
        .agg(F.max("run_len").alias("longest_voiced_run"))
    )
    base = voiced.groupBy("doc_id").agg(
        F.count("*").alias("n_frames"),
        F.sum("voiced").cast("bigint").alias("n_voiced"),
    )
    return base.join(longest, "doc_id", "left").select(
        "doc_id",
        "n_frames",
        "n_voiced",
        F.coalesce(F.col("longest_voiced_run"), F.lit(0)).alias(
            "longest_voiced_run"
        ),
    )


# ---------------------------------------------------------------------------
# m1b/m3b — parity companions for the LAST rows-only m-stages (VERDICT
# r4 §Next #5): m5 re-derives the decode/resize dimension MATH through
# its own combined batch function, but m1 and m3 themselves (their
# actual fake_decode_batch / fake_resize_batch crossings, mime
# passthrough and scale_num included) were still golden-only. These run
# the REAL registered stages unchanged and project away only the crc32
# checksums (no DuckDB equivalent) — after which every m-stage's Arrow
# crossing is value-hash-graded and ONLY the checksums remain rows-only.
# ---------------------------------------------------------------------------

_M1B_ORACLE = """
SELECT doc_id,
       'application/x-fake-image' AS mime,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       CAST(64 + octet_length(encode(text)) % 512 AS INT) AS width,
       CAST(64 + (octet_length(encode(text)) * 7) % 512 AS INT) AS height
FROM documents
"""


@register("m1b_decode_parity", oracle=_M1B_ORACLE, tags=("L5", "U3"))
def m1b_decode_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-graded m1: the registered decode stage (fake_decode_batch
    through the real mapInPandas crossing, mime string included) with
    only the crc32 checksum projected away; DuckDB re-derives byte
    count and fake dimensions from octet_length. Differs from m5 in
    that it grades m1's OWN batch function and its string-dtype
    passthrough, not a combined re-derivation.

    Scale: identical plan to m1 — worker-parallel projection, binary
    never shuffled.
    """
    return m1_multimodal_decode(spark, sf_dir).select(
        "doc_id", "mime", "n_bytes", "width", "height"
    )


_M3B_ORACLE = f"""
WITH b AS (
  SELECT doc_id,
         64 + octet_length(encode(text)) % 512 AS w,
         64 + (octet_length(encode(text)) * 7) % 512 AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INT) AS in_width,
       CAST(h AS INT) AS in_height,
       CAST(w * {TARGET_EDGE} // greatest(w, h) AS INT) AS out_width,
       CAST(h * {TARGET_EDGE} // greatest(w, h) AS INT) AS out_height,
       CAST(greatest(w, h) AS INT) AS scale_num
FROM b
"""


@register("m3b_resize_parity", oracle=_M3B_ORACLE, tags=("L5", "U3"))
def m3b_resize_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-graded m3: the registered resize stage (fake_resize_batch
    through the real mapInPandas crossing, scale_num included) with
    only the crc32 checksum projected away; DuckDB recomputes the
    integer aspect-preserving rescale from octet_length. Grades m3's
    OWN batch function — m5's combined double omits scale_num and the
    resize stage's checksum-bearing batch path.

    Scale: identical plan to m3 — worker-parallel projection, binary
    never shuffled.
    """
    return m3_image_resize(spark, sf_dir).select(
        "doc_id", "in_width", "in_height", "out_width", "out_height", "scale_num"
    )


# ---------------------------------------------------------------------------
# m8 — modality routing by MAGIC BYTES: the first thing a mixed-blob
# corpus pipeline does is sniff each payload's leading bytes and route
# it to the right decoder — container metadata lies, bytes don't. The
# fixture synthesizes the mixture deterministically (every doc_id%4
# class gets a real magic prefix), and BOTH engines construct AND
# sniff the binary, so the routing itself is value-graded.
# ---------------------------------------------------------------------------

_M8_ORACLE = """
WITH p AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN unhex('89504E47') || encode(text)
           WHEN 1 THEN unhex('52494646') || encode(text)
           WHEN 2 THEN unhex('49443303') || encode(text)
           ELSE encode(text)
         END AS payload
  FROM documents
),
s AS (
  SELECT doc_id, payload,
         CASE substring(hex(payload), 1, 8)
           WHEN '89504E47' THEN 'image/png'
           WHEN '52494646' THEN 'audio/wav'
           WHEN '49443303' THEN 'audio/mpeg'
           ELSE 'text/plain'
         END AS mime
  FROM p
)
SELECT mime,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes,
       MIN(doc_id) AS min_doc
FROM s GROUP BY mime
"""


@register("m8_mime_sniff_router", oracle=_M8_ORACLE, tags=("L5", "F8", "P6"))
def m8_mime_sniff_router(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte sniffing over a synthesized mixed-modality corpus:
    every fourth document is prefixed with a REAL container signature
    (PNG / RIFF / ID3v2.3), the router reads back ONLY the payload's
    first four bytes (hex compare — never the container hint), and the
    mixture rolls up per detected type with byte accounting. Both
    engines build the same blobs and sniff them, so the binary
    concat/slice/hex path is graded end to end.

    Scale: sniffing is a 4-byte projection in codegen — no decode, no
    Python; this is the cheap gate in front of the m1/m2/m7 decoder
    fan-out, and the rollup keys on O(types). Real corpora add a
    magic-DB broadcast; the plan shape is identical.
    """
    docs = load_table(spark, sf_dir, "documents")
    body = F.encode(F.col("text"), "utf-8")
    payload = (
        F.when(F.col("doc_id") % 4 == 0, F.concat(F.unhex(F.lit("89504E47")), body))
        .when(F.col("doc_id") % 4 == 1, F.concat(F.unhex(F.lit("52494646")), body))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.unhex(F.lit("49443303")), body))
        .otherwise(body)
    )
    p = docs.select("doc_id", payload.alias("payload"))
    mime = (
        F.when(F.hex(F.substring("payload", 1, 4)) == "89504E47", "image/png")
        .when(F.hex(F.substring("payload", 1, 4)) == "52494646", "audio/wav")
        .when(F.hex(F.substring("payload", 1, 4)) == "49443303", "audio/mpeg")
        .otherwise("text/plain")
    )
    return (
        p.select("doc_id", "payload", mime.alias("mime"))
        .groupBy("mime")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("payload")).cast("bigint").alias("total_bytes"),
            F.min("doc_id").alias("min_doc"),
        )
    )


# ---------------------------------------------------------------------------
# m9 — modality QUOTA mixer: compose a training mixture with fixed
# per-modality quotas from the m8 routing — rank each class by a
# deterministic hash draw, keep rank ≤ quota. The data-mixing step
# between routing and decode in every multimodal training pipeline.
# ---------------------------------------------------------------------------

_M9_QUOTAS = {"image/png": 100, "audio/wav": 80, "audio/mpeg": 60, "text/plain": 40}

_M9_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'image/png'
           WHEN 1 THEN 'audio/wav'
           WHEN 2 THEN 'audio/mpeg'
           ELSE 'text/plain'
         END AS mime,
         ((doc_id % 2147483648) * 2654435761) % 1000000007 AS draw
  FROM documents
),
r AS (
  SELECT mime, doc_id,
         row_number() OVER (PARTITION BY mime ORDER BY draw, doc_id) AS rk
  FROM s
),
q(mime, quota) AS (VALUES ('image/png', 100), ('audio/wav', 80),
                          ('audio/mpeg', 60), ('text/plain', 40))
SELECT r.mime,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(MIN(q.quota) AS BIGINT) AS quota,
       CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
FROM r JOIN q ON q.mime = r.mime
WHERE rk <= q.quota
GROUP BY r.mime
"""


@register("m9_modality_quota_mixer", oracle=_M9_ORACLE, tags=("L5", "S3", "W2"))
def m9_modality_quota_mixer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-quota mixture over the m8 modality classes: every
    document draws a deterministic pseudo-random rank key (the masked
    Knuth hash), ranks WITHIN its class, and survives iff its rank is
    inside the class quota — a reproducible stratified sample with
    exact per-class counts, verified by the kept-set id checksum. The
    quota table is the broadcast config a mixture experiment sweeps.

    Scale: one shuffle partitioned by modality class for the
    per-class rank (classes are few and large — at real scale salt
    the rank with the s19 bucket trick or take per-class TakeOrdered,
    both quota-exact); the quota dim broadcasts. Downstream decode
    sees exactly quota-many payloads per class, which is the point.
    """
    docs = load_table(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("doc_id") % 4 == 0, "image/png")
        .when(F.col("doc_id") % 4 == 1, "audio/wav")
        .when(F.col("doc_id") % 4 == 2, "audio/mpeg")
        .otherwise("text/plain")
    )
    draw = (
        (F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)
    ) % 1000000007
    s = docs.select("doc_id", mime.alias("mime"), draw.alias("draw"))
    w = Window.partitionBy("mime").orderBy("draw", "doc_id")
    r = s.withColumn("rk", F.row_number().over(w))
    quotas = spark.createDataFrame(
        list(_M9_QUOTAS.items()), "mime string, quota int"
    )
    kept = r.join(F.broadcast(quotas), "mime").filter(
        F.col("rk") <= F.col("quota")
    )
    return kept.groupBy("mime").agg(
        F.count("*").alias("n_kept"),
        F.min("quota").cast("bigint").alias("quota"),
        F.sum("doc_id").cast("bigint").alias("kept_id_sum"),
    )


# ---------------------------------------------------------------------------
# m10 — content-addressed binary dedup (round 5+): the storage-side
# dedup every multimodal lake runs BEFORE any decode — identical byte
# payloads (re-crawled images, re-uploaded clips) collapse to one
# stored object addressed by digest. Grouping key is sha256 over the
# payload BYTES (never the logical column), so two assets dedup iff
# their serialized bytes agree.
# ---------------------------------------------------------------------------

_M10_ORACLE = """
WITH h AS (
  SELECT doc_id, sha256(text) AS digest,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents)
SELECT digest,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       MIN(doc_id) AS canonical_doc,
       MAX(doc_id) AS last_doc,
       CAST((COUNT(*) - 1) * MIN(n_bytes) AS BIGINT) AS wasted_bytes
FROM h
GROUP BY digest
HAVING COUNT(*) >= 2
"""


@register("m10_binary_dedup", oracle=_M10_ORACLE, tags=("L5", "L1", "A5"))
def m10_binary_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate binary-asset groups by SHA-256 digest: payload =
    UTF-8 bytes of the document (the fixture's stand-in for image /
    audio blobs, same synthesis as m0), digest = ``sha2(payload, 256)``
    — DuckDB's ``sha256(text)`` hashes the identical UTF-8 bytes, so
    the hex keys match engine-to-engine. Groups with ≥2 copies report
    copy count, canonical (min) and latest (max) doc ids, and the
    bytes reclaimed by keeping one copy.

    Scale: digest is a map-side projection (64-byte key replaces the
    payload in the shuffle — the whole point: the dedup shuffle moves
    hashes, not the 100 TB of blobs); one hash aggregation keyed on
    digest, skew-free by construction (SHA-256 is uniform). The
    survivorship policy (min doc id) matches l1_exact_dedup's.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.sha2(F.encode(F.col("text"), "utf-8"), 256).alias("digest"),
        F.length(F.encode(F.col("text"), "utf-8")).cast("long").alias(
            "n_bytes"
        ),
    )
    return (
        h.groupBy("digest")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
            F.max("doc_id").alias("last_doc"),
            ((F.count("*") - 1) * F.min("n_bytes"))
            .cast("long")
            .alias("wasted_bytes"),
        )
        .filter(F.col("n_copies") >= 2)
    )


# ---------------------------------------------------------------------------
# l0m — multimodal curation pipeline (round 5+): the end-to-end chain
# a multimodal training lake runs BEFORE any decode, as ONE graded
# plan — magic-byte mime routing (m8) → content-addressed dedup
# keep-first (m10) → per-modality quota mix (m9) → manifest stats.
# Composing the stages matters: dedup must run inside each modality
# (the same bytes under a different container are different assets),
# and quotas must apply to the DEDUPED pool or duplicate-heavy
# modalities overfill.
# ---------------------------------------------------------------------------

_L0M_QUOTAS = {"image/png": 60, "audio/wav": 50, "audio/mpeg": 40, "text/plain": 30}

_L0M_ORACLE = f"""
WITH s AS (
  SELECT doc_id,
         CASE doc_id % 4
           WHEN 0 THEN 'image/png'
           WHEN 1 THEN 'audio/wav'
           WHEN 2 THEN 'audio/mpeg'
           ELSE 'text/plain'
         END AS mime,
         sha256(text) AS digest,
         CAST(octet_length(encode(text)) AS BIGINT) + 4 AS n_bytes
  FROM documents),
dedup AS (
  SELECT mime, digest, MIN(doc_id) AS doc_id, MIN(n_bytes) AS n_bytes,
         CAST(COUNT(*) AS BIGINT) AS n_copies
  FROM s GROUP BY mime, digest),
ranked AS (
  SELECT mime, doc_id, n_bytes, n_copies,
         row_number() OVER (
           PARTITION BY mime
           ORDER BY ((doc_id % 2147483648) * 2654435761) % 1000000007,
                    doc_id) AS rk
  FROM dedup),
q(mime, quota) AS (VALUES ('image/png', 60), ('audio/wav', 50),
                          ('audio/mpeg', 40), ('text/plain', 30))
SELECT s2.mime,
       CAST(MAX(raw.n_raw) AS BIGINT) AS n_raw,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(CASE WHEN s2.rk <= q.quota THEN 1 ELSE 0 END) AS BIGINT)
         AS n_selected,
       CAST(SUM(CASE WHEN s2.rk <= q.quota THEN s2.n_bytes ELSE 0 END)
            AS BIGINT) AS selected_bytes,
       CAST(MIN(CASE WHEN s2.rk <= q.quota THEN s2.doc_id END) AS BIGINT)
         AS first_selected
FROM ranked s2
JOIN q ON s2.mime = q.mime
JOIN (SELECT mime, COUNT(*) AS n_raw FROM s GROUP BY mime) raw
  ON s2.mime = raw.mime
GROUP BY s2.mime
"""


@register("l0_multimodal_curation", oracle=_L0M_ORACLE, tags=("L5", "L1", "W2"))
def l0_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One plan from raw bytes to training manifest: route by the m8
    magic-byte prefix (payload = 4 magic bytes + UTF-8 body, so
    n_bytes = body + 4), dedup per (mime, sha256-of-body) keeping the
    lowest doc id, rank the survivors by the 31-bit-masked Knuth draw,
    and admit ranks within each modality's quota (60/50/40/30).
    Reports raw vs unique vs selected counts, admitted bytes, and the
    first admitted id per modality.

    Scale: digests replace payloads in the dedup shuffle (the m10
    point); the quota rank partitions by mime — 4 partitions of
    corpus-scale size, the one deliberate skew in this family (same
    posture as m9; swap in the two-level scalable_row_number per mime
    when modality cardinality stops bounding the partition count).
    """
    docs = load_table(spark, sf_dir, "documents")
    mime = (
        F.when(F.col("doc_id") % 4 == 0, "image/png")
        .when(F.col("doc_id") % 4 == 1, "audio/wav")
        .when(F.col("doc_id") % 4 == 2, "audio/mpeg")
        .otherwise("text/plain")
    )
    body = F.encode(F.col("text"), "utf-8")
    s = docs.select(
        "doc_id",
        mime.alias("mime"),
        F.sha2(body, 256).alias("digest"),
        (F.length(body).cast("long") + 4).alias("n_bytes"),
    )
    raw = s.groupBy("mime").agg(F.count("*").alias("n_raw"))
    dedup = s.groupBy("mime", "digest").agg(
        F.min("doc_id").alias("doc_id"),
        F.min("n_bytes").alias("n_bytes"),
        F.count("*").alias("n_copies"),
    )
    draw = ((F.col("doc_id") % F.lit(2147483648)) * F.lit(2654435761)) % F.lit(
        1000000007
    )
    wr = Window.partitionBy("mime").orderBy(draw, "doc_id")
    ranked = dedup.withColumn("rk", F.row_number().over(wr))
    quotas = spark.createDataFrame(
        list(_L0M_QUOTAS.items()), "mime string, quota int"
    )
    sel = F.col("rk") <= F.col("quota")
    return (
        ranked.join(F.broadcast(quotas), "mime")
        .join(F.broadcast(raw), "mime")
        .groupBy("mime")
        .agg(
            F.max("n_raw").cast("long").alias("n_raw"),
            F.count("*").alias("n_unique"),
            F.sum(F.when(sel, 1).otherwise(0)).cast("long").alias(
                "n_selected"
            ),
            F.sum(F.when(sel, F.col("n_bytes")).otherwise(0))
            .cast("long")
            .alias("selected_bytes"),
            F.min(F.when(sel, F.col("doc_id"))).cast("long").alias(
                "first_selected"
            ),
        )
    )
