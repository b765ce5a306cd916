"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-vectorized
``mapInPandas`` stages. The decode of REAL media formats is stubbed
(``NotImplementedError`` — no image/audio libs in this container, as
SURVEY-mandated); a deterministic fake format exercises the identical
Spark-side plumbing — schema, partitioning, UDF signatures, batch shapes —
so swapping in Pillow/ffmpeg later is a one-function change.

Fake format (deterministic, derived from the driver's documents table):
  payload = MAGIC(4B) | width(uint16 LE) | height(uint16 LE) | pixel bytes
  where pixels are the utf-8 text bytes tiled to width*height.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"FIMG"
N_HIST_BINS = 16

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("format", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("n_bytes", T.LongType()),
                ]
            ),
        ),
    ]
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """documents -> deterministic fake-image table (media_id, payload, meta)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")
                w = 8 + (doc_id % 8)
                h = max(1, min(255, len(raw) // w))
                pixels = (raw * ((w * h) // max(len(raw), 1) + 1))[: w * h]
                payload = MAGIC + struct.pack("<HH", w, h) + pixels
                payloads.append(payload)
                metas.append(
                    {"format": "fake_img", "width": int(w), "height": int(h),
                     "n_bytes": len(payload)}
                )
            yield pd.DataFrame(
                {"media_id": pdf["doc_id"], "payload": payloads, "meta": metas}
            )

    return docs.select("doc_id", "text").mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(payload: bytes, fmt: str = "fake_img"):
    """Decode one payload. Real formats are stubbed by design."""
    if fmt != "fake_img":
        raise NotImplementedError(
            f"decoder for {fmt!r} requires an image/audio library not present "
            "in this container; the fake_img path exercises identical plumbing"
        )
    if payload[:4] != MAGIC:
        raise ValueError("bad magic")
    w, h = struct.unpack("<HH", payload[4:8])
    px = np.frombuffer(payload[8 : 8 + w * h], dtype=np.uint8)
    return w, h, px


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_px", T.DoubleType()),
        T.StructField("histogram", T.ArrayType(T.DoubleType())),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Per-image byte-histogram features via mapInPandas (the Pandas-UDF
    shape a real CNN/CLIP featurizer would use: batch in, matrix out)."""

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "width": [], "height": [], "mean_px": [], "histogram": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_media(bytes(payload))
                hist = np.bincount(px >> 4, minlength=N_HIST_BINS).astype(np.float64)
                hist /= max(px.size, 1)
                rows["media_id"].append(mid)
                rows["width"].append(int(w))
                rows["height"].append(int(h))
                rows["mean_px"].append(round(float(px.mean()) if px.size else 0.0, 6))
                rows["histogram"].append([round(float(x), 6) for x in hist])
            yield pd.DataFrame(rows)

    return media.mapInPandas(feats, FEATURE_SCHEMA)


def resize_media(media: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Nearest-neighbor resize of the fake images (numpy fancy-indexing —
    the vectorized kernel a real resize would replace)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def rz(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "payload": [], "width": [], "height": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, px = decode_media(bytes(payload))
                if px.size < w * h:
                    px = np.pad(px, (0, w * h - px.size))
                img = px.reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)[:, None]
                xi = (np.arange(out_w) * w // out_w)[None, :]
                small = img[yi, xi]
                out["media_id"].append(mid)
                out["payload"].append(
                    MAGIC + struct.pack("<HH", out_w, out_h) + small.tobytes()
                )
                out["width"].append(out_w)
                out["height"].append(out_h)
            yield pd.DataFrame(out)

    return media.mapInPandas(rz, schema)


def frame_sample(videos: DataFrame, every_k: int = 10) -> DataFrame:
    """(video_id, n_frames) -> sampled frame indices 0, k, 2k, ... — pure
    built-ins (sequence + explode), SQL-oracle-checkable."""
    return (
        videos.select(
            "video_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_frames") - 1, F.lit(every_k)
                )
            ).alias("frame_idx"),
        )
        .orderBy("video_id", "frame_idx")
    )


def frame_sample_oracle_sql(every_k: int = 10) -> str:
    """Oracle over a video table derived from events (n_frames = value-based)."""
    return f"""
WITH videos AS (SELECT event_id AS video_id,
                       CAST(1 + CAST(FLOOR(ABS(value)) AS BIGINT) % 100 AS BIGINT) AS n_frames
                FROM events WHERE event_id < 200)
SELECT video_id, unnest(range(0, n_frames, {every_k})) AS frame_idx
FROM videos ORDER BY video_id, frame_idx
""".strip()


def videos_from_events(events: DataFrame) -> DataFrame:
    """Deterministic fake video-metadata table from the events driver table."""
    return events.filter(F.col("event_id") < 200).select(
        F.col("event_id").alias("video_id"),
        (F.lit(1) + (F.floor(F.abs(F.col("value"))).cast("long") % 100)).alias("n_frames"),
    )
