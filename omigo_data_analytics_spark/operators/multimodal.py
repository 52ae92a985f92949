"""Multimodal columns: image/audio/video as opaque `binary` payloads with
typed metadata structs, plus the decode / feature-extract / resize /
frame-sample operator plumbing a training-data pipeline needs.

Scale design: payloads never leave the executors — every operator is
`mapInPandas` over Arrow batches, with the metadata struct as a real typed
column so Catalyst can prune/filter on it without touching bytes. At
100 TB the binary column dominates I/O, so operators accept a
`payload_col` and always allow projecting it away afterwards.

The actual media decoding (PIL/ffmpeg/soundfile) is NOT available in this
environment, so the decode kernels are STUBS, clearly marked: by default
they raise NotImplementedError; with `fake=True` they produce
deterministic synthetic outputs derived from the payload bytes so the
Spark-side plumbing (schemas, batching, partitioning) is fully testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, FloatType, IntegerType,
                               StringType, StructField, StructType)

from ..core.colutils import qcol

from ..core.dataframe import OmigoDF

MEDIA_META_SCHEMA = StructType([
    StructField("media_type", StringType()),      # image|audio|video
    StructField("format", StringType()),          # png|jpeg|wav|mp4|...
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("duration_ms", IntegerType()),
    StructField("n_bytes", IntegerType()),
])


def attach_media_metadata(odf: OmigoDF, payload_col: str,
                          media_type: str, fmt: str,
                          meta_col: str = "media_meta") -> OmigoDF:
    """Attach the typed metadata struct next to a binary payload column.
    Width/height/duration are unknown until decode; n_bytes is computed."""
    meta = F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.length(qcol(payload_col)).cast("int").alias("n_bytes"))
    return OmigoDF(odf.df.withColumn(meta_col, meta))


def _fake_pixels(payload: bytes, n: int) -> list[float]:
    """Deterministic stand-in for decoded features: bytes of repeated
    sha256 over the payload, scaled to [0,1). STUB for a real decoder."""
    out: list[float] = []
    h = hashlib.sha256(payload or b"")
    while len(out) < n:
        h = hashlib.sha256(h.digest())
        out.extend(b / 255.0 for b in h.digest())
    return out[:n]


def decode_image(odf: OmigoDF, payload_col: str, out_col: str = "pixels",
                 width: int = 8, height: int = 8, fake: bool = False) -> OmigoDF:
    """Decode image bytes to a flat float array (row-major, grayscale).

    STUB: real decoding needs an image library not present in this
    container. `fake=True` yields deterministic synthetic pixels so the
    distributed plumbing is testable end-to-end."""
    n = width * height
    schema = StructType(list(odf.df.schema.fields)
                        + [StructField(out_col, ArrayType(FloatType()))])

    def _run(batches: Iterator) -> Iterator:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decoding requires an image library (e.g. PIL) "
                    "that is not installed; pass fake=True for the "
                    "deterministic test stub")
            pdf[out_col] = [
                _fake_pixels(bytes(p) if p is not None else b"", n)
                for p in pdf[payload_col]]
            yield pdf

    return OmigoDF(odf.df.mapInPandas(_run, schema=schema))


def image_features(odf: OmigoDF, pixels_col: str = "pixels",
                   prefix: str = "img") -> OmigoDF:
    """Basic features over a decoded pixel array — pure SQL expressions
    (mean/min/max), no Python: runs at scan throughput. An empty pixel
    array yields NULL features (nullif guard — an unguarded division
    would throw ANSI DIVIDE_BY_ZERO and kill the job, r10 review)."""
    p = pixels_col
    mean = f"aggregate({p}, 0D, (a, x) -> a + x) / nullif(size({p}), 0)"
    return OmigoDF(
        odf.df
        .withColumn(f"{prefix}:mean", F.round(F.expr(mean), 6))
        .withColumn(f"{prefix}:min", F.round(F.array_min(p), 6))
        .withColumn(f"{prefix}:max", F.round(F.array_max(p), 6)))


def resize_image(odf: OmigoDF, pixels_col: str, src_w: int, src_h: int,
                 dst_w: int, dst_h: int, out_col: str | None = None) -> OmigoDF:
    """Nearest-neighbor resize of a flat pixel array — pure SQL expression
    over array indexing (no Python; a real pipeline would swap in a
    vectorized Pandas-UDF kernel with an image library)."""
    out_col = out_col or pixels_col
    idx = (f"transform(sequence(0, {dst_h * dst_w - 1}), i -> "
           f"element_at({pixels_col}, "
           f"CAST((i DIV {dst_w}) * {src_h} / {dst_h} AS INT) * {src_w} + "
           f"CAST((i % {dst_w}) * {src_w} / {dst_w} AS INT) + 1))")
    return OmigoDF(odf.df.withColumn(out_col, F.expr(idx)))


def sample_frames(odf: OmigoDF, payload_col: str, every_ms: int,
                  meta_col: str = "media_meta", out_col: str = "frame_ts_ms",
                  fake: bool = False) -> OmigoDF:
    """Explode a video payload into one row per sampled frame timestamp.

    STUB decode: real frame extraction needs ffmpeg. With `fake=True` the
    duration is derived deterministically from payload length (1 byte =
    1 ms) so the explode plumbing is real and testable."""
    if not fake:
        def _raise(_it):
            raise NotImplementedError(
                "video frame sampling requires ffmpeg, not installed; "
                "pass fake=True for the deterministic test stub")
            yield  # pragma: no cover
        return OmigoDF(odf.df.mapInPandas(_raise, schema=odf.df.schema))
    dur = F.coalesce(F.col(f"{meta_col}.duration_ms"),
                     F.length(payload_col).cast("int"))
    # a zero-length payload / zero duration must yield ZERO frames for
    # that row — sequence(0, -1, step>0) has illegal bounds under ANSI
    # and would fail the whole job; explode of a NULL array drops the row
    seq = F.when(dur > 0, F.sequence(F.lit(0), dur - 1, F.lit(every_ms)))
    return OmigoDF(odf.df.withColumn(out_col, F.explode(seq)))
