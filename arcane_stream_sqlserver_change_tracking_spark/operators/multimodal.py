"""Multimodal columns — image/audio/video as opaque ``binary`` payloads
with typed metadata, processed with Arrow-batched ``mapInPandas``.

The reference engine is flat-relational (SURVEY.md §1.2) and has no
media surface; this module is part of the training-data-pipeline
extension the engine carries beyond reference parity. Design:

* media rides in a ``binary`` column + a typed metadata struct — the
  lake table / CDC path treats it as just another payload column
  (bucket partitioning, schema evolution, CoW merge all apply);
* decode / feature-extraction / resize / frame-sampling run as
  ``mapInPandas`` stages: Arrow batches in, Arrow batches out, zero
  per-row Python overhead beyond the (stubbed) codec call itself;
* the actual codec calls are STUBBED — this container ships no
  image/audio libraries. ``decode_stub="fake"`` (default) derives
  deterministic pseudo-metadata from the bytes so plumbing is testable
  end-to-end and cross-checkable in DuckDB; ``decode_stub="real"``
  raises ``NotImplementedError`` at the exact call site where PIL /
  ffmpeg / torchaudio would plug in.

Partitioning note for 100 TB of media: binaries dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row counts) sizes the tasks,
and mapInPandas streams one Arrow batch at a time — peak memory per
task ~ one batch of decoded payloads, not the whole partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: metadata schema attached alongside every binary payload column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),  # sha256 hex
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test/demo payload synthesis: utf-8 bytes of a text column as the
    opaque media blob + its typed metadata (a real pipeline lands the
    blob from object storage instead)."""
    blob = F.encode(F.col(text_col), "utf-8")
    return df.withColumn("payload", blob).withColumn(
        "media_meta",
        F.struct(
            F.lit("image").alias("media_type"),
            F.octet_length(blob).cast("long").alias("n_bytes"),
            F.sha2(blob, 256).alias("content_hash"),
        ),
    )


def _fake_decode(blobs: pd.Series) -> pd.DataFrame:
    """Deterministic stand-in for an image decode: metadata derived
    purely from the bytes (n_bytes, sha256, pseudo width/height) —
    vectorized pandas ops + C-speed hashlib over the batch."""
    n_bytes = blobs.map(len).astype("int64")
    content_hash = blobs.map(lambda b: hashlib.sha256(b).hexdigest())
    width = (n_bytes % 1920 + 1).astype("int32")
    height = (n_bytes * 7 % 1080 + 1).astype("int32")
    return pd.DataFrame(
        {"n_bytes": n_bytes, "content_hash": content_hash,
         "width": width, "height": height}
    )


def decode_media(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_stub: str = "fake",
) -> DataFrame:
    """Decode each blob to per-media metadata/features via mapInPandas.

    Batch shape: Arrow record batches of (id, payload); output batches
    follow DECODED_SCHEMA. Swap ``_fake_decode`` for a real codec
    (PIL.Image.open over io.BytesIO per batch) to productionize —
    the Spark-side contract does not change.
    """
    if decode_stub == "real":
        raise NotImplementedError(
            "real media decoding requires PIL/ffmpeg, not shipped in this "
            "container — plug the codec into _fake_decode's seam"
        )
    if decode_stub != "fake":
        raise ValueError(f"unknown decode_stub: {decode_stub!r}")

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = _fake_decode(pdf[payload_col])
            out.insert(0, "doc_id", pdf[id_col].astype("int64").to_numpy())
            yield out

    return df.select(id_col, payload_col).mapInPandas(_decode, DECODED_SCHEMA)


def resize_media(
    df: DataFrame,
    target_width: int,
    target_height: int,
    payload_col: str = "payload",
) -> DataFrame:
    """Resize stub: passes blobs through mapInPandas unchanged but
    re-stamps the declared geometry — the real implementation replaces
    the identity transform with a codec resize. Keeps (schema,
    partitioning, batch shape) production-true."""
    schema = T.StructType(
        df.schema.fields
        + [T.StructField("resized_width", T.IntegerType()),
           T.StructField("resized_height", T.IntegerType())]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            # real impl: pdf[payload_col] = [codec_resize(b, w, h) for batch]
            pdf["resized_width"] = target_width
            pdf["resized_height"] = target_height
            yield pdf

    return df.mapInPandas(_resize, schema)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Frame-sampling stub for video blobs: emits one row per sampled
    'frame' (here: a byte-offset slice) — demonstrates the 1-to-many
    mapInPandas explode shape real frame extraction uses."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_hash", T.StringType()),
        ]
    )

    import numpy as np

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[payload_col].to_numpy()
            lens = np.fromiter((len(b) for b in blobs), dtype=np.int64,
                               count=len(blobs))
            n_frames = -(-lens // every_n_bytes)  # ceil; 0 for empty
            # vectorized 1-to-many bookkeeping: repeat ids per frame
            # count, flat frame indices and byte offsets via np ranges
            ids = np.repeat(pdf[id_col].to_numpy().astype("int64"), n_frames)
            total = int(n_frames.sum())
            starts = np.zeros(len(blobs), dtype=np.int64)
            if len(blobs) > 1:
                np.cumsum(n_frames[:-1], out=starts[1:])
            idxs = np.arange(total, dtype=np.int64) - np.repeat(starts, n_frames)
            rep_blobs = np.repeat(blobs, n_frames)
            offs = idxs * every_n_bytes
            # the per-frame call is the codec seam itself (a real
            # extractor invokes the decoder once per frame); everything
            # around it is array arithmetic
            hashes = [
                hashlib.sha256(b[o:o + every_n_bytes]).hexdigest()
                for b, o in zip(rep_blobs, offs)
            ]
            yield pd.DataFrame(
                {"doc_id": pd.Series(ids, dtype="int64"),
                 "frame_idx": pd.Series(idxs.astype("int32"), dtype="int32"),
                 "frame_hash": pd.Series(hashes, dtype="object")}
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, schema)
