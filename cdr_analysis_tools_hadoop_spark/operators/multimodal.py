"""Multimodal (image/audio/video) column plumbing over binary columns.

BASELINE.json input_hint: images travel as opaque `binary` columns
with typed metadata (w, h, fmt). Real decode libraries are absent in
this environment, so:

- the engine's own numpy codecs (functions/codec.py) are REAL and
  fully exercised (decode, validate, re-encode, quantize);
- external formats (JPEG/WEBP/H264) raise NotImplementedError inside
  the same kernels — the Spark-side plumbing (schema, Arrow batching,
  partitioning) is identical and is what's tested.

All kernels are mapInPandas over Arrow batches: one numpy call per
image, zero per-row Python in the Spark sense (no row-at-a-time UDF,
no collect).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType, BooleanType, DoubleType, IntegerType, LongType, StructField,
    StructType,
)

from ..functions import codec


def decode_features(images: DataFrame) -> DataFrame:
    """Decode every blob and emit per-image features:
    mean luma, pixel phash (average-hash), PSNR of a qnt4 re-encode
    round-trip, and the >=40dB validity flag.

    This is the decode-validate stage of the benchmark pipeline."""
    out_schema = StructType(
        [
            StructField("image_id", images.schema["image_id"].dataType),
            StructField("phash", LongType()),
            StructField("pixel_phash", LongType()),
            StructField("mean_luma", DoubleType()),
            StructField("qnt4_psnr", DoubleType()),
            StructField("psnr_ok", BooleanType()),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            ids, ph, pph, ml, ps, ok = [], [], [], [], [], []
            for image_id, phash, blob in zip(
                pdf["image_id"], pdf["phash"], pdf["bytes"]
            ):
                pix = codec.decode(bytes(blob))
                luma = pix.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                rt = codec.decode(codec.encode_qnt4(pix))
                p = codec.psnr(pix, rt)
                ids.append(image_id)
                ph.append(int(phash))
                pph.append(codec.phash_ahash(pix))
                ml.append(float(luma.mean()))
                ps.append(min(p, 1e9))
                ok.append(p >= 40.0)
            yield pd.DataFrame(
                {
                    "image_id": ids,
                    "phash": ph,
                    "pixel_phash": pph,
                    "mean_luma": ml,
                    "qnt4_psnr": ps,
                    "psnr_ok": ok,
                }
            )

    return images.select("image_id", "phash", "bytes").mapInPandas(
        kernel, schema=out_schema
    )


def transcode(images: DataFrame, to_fmt: str = "qnt4") -> DataFrame:
    """Re-encode blobs to another engine codec (resize path for qz2)."""
    enc = {
        "rawz": codec.encode_rawz,
        "pngl": codec.encode_pngl,
        "qnt4": codec.encode_qnt4,
        "qz2": codec.encode_qz2,
    }[to_fmt]
    schema = StructType(
        [
            StructField("image_id", images.schema["image_id"].dataType),
            StructField("bytes", BinaryType()),
            StructField("fmt", images.schema["fmt"].dataType),
        ]
    )

    def kernel(batches):
        for pdf in batches:
            blobs = [enc(codec.decode(bytes(b))) for b in pdf["bytes"]]
            yield pd.DataFrame(
                {"image_id": pdf["image_id"], "bytes": blobs, "fmt": to_fmt}
            )

    return images.select("image_id", "bytes", "fmt").mapInPandas(kernel, schema=schema)


def frame_sample_stub(videos: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: schema + batching are real; the
    H264 decode raises NotImplementedError by design (no codec libs in
    this environment). Kept as the documented extension point."""

    def kernel(batches):
        for pdf in batches:
            for b in pdf["bytes"]:
                codec.decode(bytes(b))  # raises NotImplementedError for H264
            yield pdf

    return videos.mapInPandas(kernel, schema=videos.schema)


def resize_box(images: DataFrame, factor: int = 2) -> DataFrame:
    """Thumbnail generation: decode, box-average downsample by
    ``factor``, re-encode (rawz). Real pixel math end-to-end — the
    standard pre-training resize step expressed as the same Arrow
    batch shape as decode/transcode."""
    schema = StructType(
        [
            StructField("image_id", images.schema["image_id"].dataType),
            StructField("w", IntegerType()),
            StructField("h", IntegerType()),
            StructField("bytes", BinaryType()),
        ]
    )

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            ids, ws, hs, blobs = [], [], [], []
            for i, b in zip(pdf["image_id"], pdf["bytes"]):
                pix = codec.decode(bytes(b))
                h, w, c = pix.shape
                h2, w2 = (h // factor) * factor, (w // factor) * factor
                small = (
                    pix[:h2, :w2]
                    .reshape(h2 // factor, factor, w2 // factor, factor, c)
                    .mean(axis=(1, 3))
                    .astype(np.uint8)
                )
                ids.append(i)
                hs.append(small.shape[0])
                ws.append(small.shape[1])
                blobs.append(codec.encode_rawz(small))
            yield pd.DataFrame({"image_id": ids, "w": ws, "h": hs, "bytes": blobs})

    return images.select("image_id", "bytes").mapInPandas(kernel, schema=schema)
