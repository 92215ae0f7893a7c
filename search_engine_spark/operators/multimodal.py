"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing — schemas, partitioning, UDF signatures, batch
shapes — is real and tested; the actual media decoding is STUBBED because
no image/audio codec libraries exist in this sandbox:

- ``decode_image`` raises ``NotImplementedError`` unless a deterministic
  fake decoder is injected (tests use ``fake_rgb_decoder``).
- every transform is a pure function of (payload bytes, metadata), so
  swapping the stub for a real decoder (PIL / torchaudio / pyav) changes
  no Spark code.

Design notes for 100 TB of media:
- payloads stay opaque bytes end-to-end; Spark never interprets them JVM-
  side, so the only cost is Arrow transfer into the Python worker once per
  stage — fuse transforms into ONE mapInPandas to avoid repeated transfer.
- `mapInPandas` (not a scalar UDF) lets one input row yield many output
  rows (frame sampling) and lets us drop the payload column early
  (column pruning through the iterator).
- metadata (width/height/duration/codec) is columnar and JVM-side, so
  filters like `width >= 224` prune BEFORE any payload reaches Python.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Schemas (schema-on-write, like every other table in the engine)
# ---------------------------------------------------------------------------
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField("codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

IMAGE_FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
        T.StructField("mean_r", T.DoubleType(), False),
        T.StructField("mean_g", T.DoubleType(), False),
        T.StructField("mean_b", T.DoubleType(), False),
        T.StructField("payload_sha_prefix", T.StringType(), False),
    ]
)

FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


# ---------------------------------------------------------------------------
# Decoders — stubbed behind injection
# ---------------------------------------------------------------------------
def decode_image(payload: bytes, codec: str) -> np.ndarray:
    """payload -> HxWx3 uint8 array. No codec libs in this sandbox."""
    raise NotImplementedError(
        "media decoding requires an image codec library (e.g. PIL); "
        "inject a decoder via the `decoder=` argument"
    )


def fake_rgb_decoder(payload: bytes, codec: str) -> np.ndarray:
    """Deterministic fake: payload bytes ARE the raw HxWx3 buffer, with the
    dims recovered from a 8-byte header. Used by tests so the full Spark
    pipeline runs without codec libraries."""
    h = int.from_bytes(payload[:4], "big")
    w = int.from_bytes(payload[4:8], "big")
    return np.frombuffer(payload[8:], dtype=np.uint8).reshape(h, w, 3)


def fake_rgb_encode(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return h.to_bytes(4, "big") + w.to_bytes(4, "big") + arr.tobytes()


# ---------------------------------------------------------------------------
# Transforms
# ---------------------------------------------------------------------------
def image_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = decode_image,
    min_width: int | None = None,
) -> DataFrame:
    """Per-image channel means + a payload fingerprint. The width filter is
    a metadata predicate — pushed to the scan, payloads of small images
    never cross into Python."""
    import hashlib

    # NULL-metadata policy: a NULL width must not silently drop the row
    # through a "no-op" default predicate (NULL >= 1 filters in SQL), so
    # None is the explicit "no gate requested" sentinel and the gate
    # applies whenever the caller passed ANY value — including
    # min_width=1, which a magic `> 1` default could not distinguish
    # from "unset" and would silently skip (letting width-0 rows through
    # to decode); rows with no payload carry nothing to decode and are
    # excluded by every transform here.
    filtered = media.filter(
        (F.col("kind") == "image") & F.col("payload").isNotNull()
    )
    if min_width is not None:
        filtered = filtered.filter(F.col("width") >= min_width)
    filtered = filtered.select("media_id", "payload", "codec")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, codec in zip(
                pdf["media_id"], pdf["payload"], pdf["codec"]
            ):
                arr = decoder(bytes(payload), codec)
                # exact integer channel sums, then ONE IEEE division each —
                # bit-identical to the SQL oracle's SUM(int)::DOUBLE / n
                flat = arr.reshape(-1, 3).astype(np.int64)
                sums = flat.sum(axis=0)
                npx = flat.shape[0]
                if npx == 0:  # degenerate decode (0-pixel payload)
                    continue
                rows.append(
                    (
                        int(mid),
                        int(arr.shape[1]),
                        int(arr.shape[0]),
                        float(sums[0]) / npx,
                        float(sums[1]) / npx,
                        float(sums[2]) / npx,
                        hashlib.sha256(bytes(payload)).hexdigest()[:16],
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_FEATURES.fields]
            )

    return filtered.mapInPandas(extract, schema=IMAGE_FEATURES)


def resize_images(
    media: DataFrame,
    target: int = 224,
    decoder: Callable[[bytes, str], np.ndarray] = decode_image,
) -> DataFrame:
    """Nearest-neighbor resize to (target, target); re-encoded with the
    fake codec (payload stays opaque bytes downstream)."""
    imgs = media.filter(
        (F.col("kind") == "image") & F.col("payload").isNotNull()
    ).select("media_id", "payload", "codec")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, codec in zip(
                pdf["media_id"], pdf["payload"], pdf["codec"]
            ):
                arr = decoder(bytes(payload), codec)
                h, w = arr.shape[:2]
                yi = (np.arange(target) * h // target).astype(np.int64)
                xi = (np.arange(target) * w // target).astype(np.int64)
                small = arr[yi][:, xi]
                rows.append(
                    (int(mid), fake_rgb_encode(small), target, target)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "payload", "width", "height"]
            )

    return imgs.mapInPandas(resize, schema=out_schema)


def sample_frames(
    media: DataFrame,
    every_n: int = 10,
) -> DataFrame:
    """Video frame sampling: one input row -> many frame rows (the
    mapInPandas 1:N shape). Frame extraction is stubbed as byte-slicing the
    opaque payload at n_frames boundaries — a real pyav demuxer drops in
    without changing the plan."""
    vids = media.filter(
        (F.col("kind") == "video")
        & F.col("payload").isNotNull()
        & F.col("n_frames").isNotNull()
    ).select("media_id", "payload", "n_frames")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload, n_frames in zip(
                pdf["media_id"], pdf["payload"], pdf["n_frames"]
            ):
                buf = bytes(payload)
                n = int(n_frames)
                if n <= 0 or len(buf) < n:
                    continue
                frame_len = len(buf) // n
                for i in range(0, n, every_n):
                    rows.append(
                        (int(mid), i, buf[i * frame_len : (i + 1) * frame_len])
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "payload"])

    return vids.mapInPandas(sample, schema=FRAMES)


def audio_stats(media: DataFrame) -> DataFrame:
    """Audio 'feature extraction' over the opaque payload interpreted as
    int16 PCM (the deterministic fake for codec-less environments): RMS
    energy + duration check vs metadata."""
    auds = media.filter(
        (F.col("kind") == "audio")
        & F.col("payload").isNotNull()
        & F.col("sample_rate").isNotNull()
        & F.col("duration_ms").isNotNull()
    ).select("media_id", "payload", "sample_rate", "duration_ms")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), False),
            T.StructField("rms", T.DoubleType(), False),
            T.StructField("meta_consistent", T.BooleanType(), False),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            rows = []
            for mid, payload, sr, dur in zip(
                pdf["media_id"], pdf["payload"], pdf["sample_rate"],
                pdf["duration_ms"],
            ):
                pcm = np.frombuffer(bytes(payload), dtype=np.int16)
                # exact int64 sum of squares (numpy-batched), then one IEEE
                # division + sqrt — bit-identical to the SQL oracle
                if pcm.size:
                    p64 = pcm.astype(np.int64)
                    ss = int(p64 @ p64)
                    rms = math.sqrt(ss / pcm.size)
                else:
                    rms = 0.0
                expect = int(sr) * int(dur) // 1000
                rows.append(
                    (int(mid), int(pcm.size), rms, abs(pcm.size - expect) <= 1)
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "rms", "meta_consistent"]
            )

    return auds.mapInPandas(stats, schema=out_schema)


# ---------------------------------------------------------------------------
# Deterministic synthetic media (tests / demos only — no external data)
# ---------------------------------------------------------------------------
def make_media(n: int = 60, seed: int = 42) -> pd.DataFrame:
    """Deterministic synthetic media — every metadata field and payload byte
    is pure integer arithmetic on media_id, so a SQL oracle can recompute
    features exactly (entry_queries media_* oracles):

      image (i%3==0): h = 8+(i*7)%56, w = 8+(i*5)%56,
                      pixel(y,x,c) = (i*31 + y*17 + x*13 + c*7) % 256
      audio (i%3==1): sr = 16000, dur_ms = 10+(i*37)%490,
                      pcm[j] = (i*131 + j*17) % 4096 - 2048  (int16)
      video (i%3==2): n_frames = 5+(i*11)%35, frame_len = 40+(i%50),
                      payload[j] = (i + j) % 256

    ``seed`` is accepted for API compatibility; the data is seed-free.
    The frame is built dtype=object so nullable int metadata stays
    python-int/None (pandas would otherwise promote to float64, which
    spark.createDataFrame rejects for IntegerType)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            h, w = 8 + (i * 7) % 56, 8 + (i * 5) % 56
            y, x, c = np.ogrid[:h, :w, :3]
            arr = ((i * 31 + y * 17 + x * 13 + c * 7) % 256).astype(np.uint8)
            rows.append(
                (i, kind, fake_rgb_encode(arr), "fake-rgb", w, h, None, None, None)
            )
        elif kind == "audio":
            sr = 16000
            dur = 10 + (i * 37) % 490
            j = np.arange(sr * dur // 1000, dtype=np.int64)
            pcm = ((i * 131 + j * 17) % 4096 - 2048).astype(np.int16)
            rows.append(
                (i, kind, pcm.tobytes(), "pcm16", None, None, None, sr, dur)
            )
        else:
            n_frames = 5 + (i * 11) % 35
            frame_len = 40 + (i % 50)
            j = np.arange(n_frames * frame_len, dtype=np.int64)
            payload = ((i + j) % 256).astype(np.uint8).tobytes()
            rows.append(
                (i, kind, payload, "fake-frames", None, None, n_frames, None, None)
            )
    return pd.DataFrame(
        rows,
        columns=[
            "media_id", "kind", "payload", "codec", "width", "height",
            "n_frames", "sample_rate", "duration_ms",
        ],
        dtype=object,
    )
