"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched kernels.

The Spark-side contract (schemas, partitioning, UDF signatures, Arrow
batch shapes, 1→N frame explosion) is real and tested; the codec layer
is STUBBED because no image/audio libraries exist in this container:

* ``decode_image``/``decode_audio`` are DETERMINISTIC FAKES — they
  synthesize arrays from an md5 keystream of the payload, so every
  downstream kernel (features, resize, phash, frame sampling) is fully
  exercised and reproducible;
* swap in a real codec by replacing the two ``_fake_*`` functions (the
  signatures are the integration point), or raise
  ``NotImplementedError`` where a real decode is mandatory.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, sample_rate int, duration_ms int, codec string"
)


def _keystream(payload: bytes, n: int) -> np.ndarray:
    """Deterministic uint8 stream from an md5-CTR over the payload.

    The chain is hex-string based (block c = md5(md5hex(payload) ||
    '|' || str(c)), bytes = hex pairs) so a SQL oracle can recompute it
    with VARCHAR md5 in any engine — DuckDB 1.0 has no BLOB md5."""
    seed = hashlib.md5(payload).hexdigest()
    blocks = []
    for c in range(-(-n // 16)):
        blocks.append(hashlib.md5(f"{seed}|{c}".encode()).hexdigest())
    return np.frombuffer(bytes.fromhex("".join(blocks))[:n], dtype=np.uint8)


def decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB DECODE (deterministic fake): (height, width, 3) uint8.
    Replace with a real codec (PIL/opencv) when available."""
    return _keystream(payload, width * height * 3).reshape(height, width, 3)


def decode_audio(payload: bytes, sample_rate: int, duration_ms: int) -> np.ndarray:
    """STUB DECODE (deterministic fake): float32 mono PCM in [-1, 1]."""
    n = max(1, sample_rate * duration_ms // 1000)
    raw = _keystream(payload, n)
    return (raw.astype(np.float32) - 127.5) / 127.5


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents (payload =
    UTF-8 text bytes; metadata derived from doc fields)."""
    from ..plans.partitioning import ensure_min_parallelism

    docs = ensure_min_parallelism(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), waves=1
    )
    return docs.selectExpr(
        "CAST(doc_id AS BIGINT) AS media_id",
        "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind",
        "CAST(encode(text, 'UTF-8') AS BINARY) AS payload",
        # multiples of 8 -> the 8x8 phash grid has EQUAL block sizes,
        # keeping the feature math integer-exact (oracle-reproducible)
        "CAST(16 + (n_chars % 8) * 8 AS INT) AS width",
        "CAST(16 + (n_chars % 5) * 8 AS INT) AS height",
        "CAST(8000 AS INT) AS sample_rate",
        "CAST(200 + (n_chars % 10) * 100 AS INT) AS duration_ms",
        "'fake' AS codec",
    )


def _spread(df: DataFrame) -> DataFrame:
    """Guarded spread before a per-row Python decode stage (the media
    table derives from the one-row-group documents scan)."""
    from ..plans.partitioning import ensure_min_parallelism

    return ensure_min_parallelism(df)


def image_features(df: DataFrame) -> DataFrame:
    """Per-image features via Arrow batches: per-channel SUMS (integer
    — exact, so the SQL oracle reproduces them bit-for-bit; a mean is
    one division away) and an 8x8 average-hash packed into a BIGINT.

    phash rule (all-integer): grid cell = sum of (r+g+b) over an equal
    h/8 × w/8 pixel block; bit i set iff 2*grid[i] > (s31 + s32) where
    s31/s32 are the two middle values of the sorted grid (the median×2
    — avoids float division).  Bit 63 kept clear for signed int64."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sums, npx, phashes = [], [], [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                w, h = int(w), int(h)
                img = decode_image(bytes(payload), w, h).astype(np.int64)
                ids.append(mid)
                sums.append(img.reshape(-1, 3).sum(axis=0))
                npx.append(w * h)
                # equal 8x8 blocks (w, h are multiples of 8 by contract)
                grid = (
                    img.sum(axis=2)
                    .reshape(8, h // 8, 8, w // 8)
                    .sum(axis=(1, 3))
                    .ravel()
                )
                srt = np.sort(grid)
                med2 = int(srt[31]) + int(srt[32])
                bits = (2 * grid > med2).astype(np.uint64)
                phashes.append(int((bits[:63] << np.arange(63, dtype=np.uint64)).sum()))
            ss = np.array(sums, dtype=np.int64) if sums else np.zeros((0, 3), dtype=np.int64)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "sum_r": ss[:, 0] if len(ids) else [],
                    "sum_g": ss[:, 1] if len(ids) else [],
                    "sum_b": ss[:, 2] if len(ids) else [],
                    "n_px": npx,
                    "phash": phashes,
                }
            )

    src = _spread(df.where("kind = 'image'").select("media_id", "payload", "width", "height"))
    return src.mapInPandas(
        fn,
        "media_id bigint, sum_r bigint, sum_g bigint, sum_b bigint, n_px bigint, phash bigint",
    )


def resize_images(df: DataFrame, out_w: int = 8, out_h: int = 8) -> DataFrame:
    """Block-mean resize; emits raw RGB bytes of the target size (the
    batch contract a real thumbnailer would use)."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]
            ):
                img = decode_image(bytes(payload), int(w), int(h)).astype(np.float64)
                ys = np.array_split(np.arange(img.shape[0]), out_h)
                xs = np.array_split(np.arange(img.shape[1]), out_w)
                small = np.array(
                    [[img[np.ix_(y, x)].mean(axis=(0, 1)) for x in xs] for y in ys]
                ).astype(np.uint8)
                ids.append(mid)
                blobs.append(small.tobytes())
            yield pd.DataFrame({"media_id": ids, "thumb": blobs})

    src = _spread(df.where("kind = 'image'").select("media_id", "payload", "width", "height"))
    return src.mapInPandas(fn, "media_id bigint, thumb binary")


def sample_frames(df: DataFrame, every_ms: int = 250) -> DataFrame:
    """Video frame sampling: 1→N row explosion inside the Arrow batch
    (each frame is a fake-decoded image keyed by (payload, ts))."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, frames = [], [], [], []
            for mid, payload, w, h, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"],
                pdf["duration_ms"],
            ):
                for i, ts in enumerate(range(0, int(dur), every_ms)):
                    frame = decode_image(bytes(payload) + ts.to_bytes(4, "big"), int(w), int(h))
                    ids.append(mid)
                    idxs.append(i)
                    tss.append(ts)
                    frames.append(frame.tobytes())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "ts_ms": tss, "frame": frames}
            )

    src = _spread(df.where("kind = 'video'").select(
        "media_id", "payload", "width", "height", "duration_ms"
    ))
    return src.mapInPandas(fn, "media_id bigint, frame_idx int, ts_ms int, frame binary")


def audio_features(df: DataFrame) -> DataFrame:
    """Per-clip RMS/zero-crossing stats over the fake PCM stream."""

    def fn(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rms, zcr = [], [], []
            for mid, payload, sr, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"], pdf["duration_ms"]
            ):
                pcm = decode_audio(bytes(payload), int(sr), int(dur))
                ids.append(mid)
                rms.append(float(np.sqrt((pcm ** 2).mean())))
                zcr.append(float((np.diff(np.signbit(pcm)) != 0).mean()))
            yield pd.DataFrame({"media_id": ids, "rms": rms, "zcr": zcr})

    src = _spread(df.where("kind = 'audio'").select("media_id", "payload", "sample_rate", "duration_ms"))
    return src.mapInPandas(fn, "media_id bigint, rms double, zcr double")
