"""Multimodal column plumbing (SURVEY.md §2.10 L5; driver north star).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side plumbing — schema, Arrow batch shape,
mapInPandas signatures, partitioning — is real and tested; the actual
codec step is STUBBED (this container has no image/audio libs): decode
either raises NotImplementedError (strict mode) or produces a
deterministic fake derived from the payload bytes (test mode), clearly
marked below.

At 100 TB: payloads dominate row size, so the frame is repartitioned by
byte budget before any mapInPandas (maxRecordsPerBatch keeps Arrow
batches bounded), and metadata-only queries never touch the binary
column thanks to parquet column pruning.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image | audio | video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("content_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("source_uri", T.StringType()),
    ]), True),
])

DECODED_IMAGE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("feature", T.ArrayType(T.FloatType())),
])


def read_binary_dir(spark, path: str) -> DataFrame:
    """Directory of media files -> MEDIA_SCHEMA frame via Spark's
    binaryFile source (path/length/content columns, pruning-friendly)."""
    raw = spark.read.format("binaryFile").load(path)
    return raw.select(
        F.xxhash64("path").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.col("length").alias("n_bytes"),
            F.col("path").alias("source_uri"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes | None) -> tuple[int, int, int, list[float]]:
    # STUB: deterministic fake "decode" — dimensions and an 8-dim feature
    # derived purely from payload bytes. Replace with PIL/libav decode in
    # a real deployment; the Spark plumbing around it is unchanged.
    if not payload:
        return (0, 0, 0, [0.0] * 8)
    n = len(payload)
    width = 1 + n % 640
    height = 1 + (n // 640) % 480
    feature = [float(payload[i % n]) / 255.0 for i in range(8)]
    return (width, height, 3, feature)


#: Session conf governing Arrow INPUT batch row counts for every
#: mapInPandas in the session — the only place an input-batch cap can
#: actually take effect (see decode_images docstring).
ARROW_BATCH_CONF = "spark.sql.execution.arrow.maxRecordsPerBatch"


def cap_arrow_batches(spark, max_records: int = 256):
    """Session-build helper: cap Arrow input batches for payload-heavy
    pipelines. With multi-MB binary payloads the 10k-row default means
    multi-GB Arrow batches per task; call this right after building the
    session (before any plan executes) so every mapInPandas in the
    session sees bounded batches. Returns the session for chaining."""
    spark.conf.set(ARROW_BATCH_CONF, str(max_records))
    return spark


def decode_images(media: DataFrame, strict: bool = False,
                  batch_rows: int = 64,
                  warn_input_batch_rows: int = 4096) -> DataFrame:
    """Decode/feature-extract images with mapInPandas. ``strict=True``
    raises NotImplementedError (no codec libs here); ``strict=False``
    runs the deterministic fake so the pipeline shape is testable
    end-to-end.

    Batch bounding: OUTPUT batches are chunked to ``batch_rows`` inside
    the generator (decoded feature rows are wide). The INPUT Arrow batch
    size is governed by the session's
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — deliberately NOT
    mutated here: the plan is lazy, so a set-here/restore-later around a
    transformation either leaks the setting into the whole session or
    restores it before execution reads it. Callers feeding multi-MB
    payloads should cap that conf at session-build time
    (:func:`cap_arrow_batches`); if the session value exceeds
    ``warn_input_batch_rows`` a warning fires here so the risk is
    surfaced where the payload source is built, not just documented."""
    try:
        conf_rows = int(media.sparkSession.conf.get(ARROW_BATCH_CONF))
    except Exception:
        conf_rows = 10_000  # Spark's default when unset/unreadable
    if conf_rows > warn_input_batch_rows:
        import warnings
        warnings.warn(
            f"decode_images: {ARROW_BATCH_CONF}={conf_rows} exceeds "
            f"{warn_input_batch_rows}; with multi-MB payloads each Arrow "
            f"input batch can reach GBs per task. Cap it at session build "
            f"time with cap_arrow_batches(spark).", ResourceWarning,
            stacklevel=2)

    def run(batches):
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "image decode requires codec libraries not present in "
                    "this environment; see _fake_decode for the test path")
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo:lo + batch_rows]
                out = {"media_id": [], "width": [], "height": [],
                       "n_channels": [], "feature": []}
                for _, row in chunk.iterrows():
                    w, h, c, feat = _fake_decode(row["payload"])
                    out["media_id"].append(row["media_id"])
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_channels"].append(c)
                    out["feature"].append(feat)
                yield pd.DataFrame(out)

    media = media.select("media_id", "payload")
    return media.mapInPandas(run, DECODED_IMAGE_SCHEMA)


def synthetic_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA frame from the documents table (UTF-8 bytes
    as payload) — the deterministic test corpus for the decode path."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("content_type"),
            F.col("n_chars").alias("n_bytes"),
            F.concat(F.lit("doc://"), F.col("doc_id")).alias("source_uri"),
        ).alias("meta"),
    )
