"""Multimodal (binary) columns — image/audio/video payloads as opaque
``binary`` columns with typed metadata, processed via Arrow-batched
``mapInPandas`` (north-star builder brief; absent from the reference,
which is pure relational SQL).

Design for 100 TB:
- media lives in a ``content: binary`` column next to typed metadata —
  one row per asset, partitioned like any other table (size-capped rows;
  bigger assets would hold a URI + byte-range instead);
- every decode/feature/resize step is a ``mapInPandas`` stage: Arrow
  moves the binary batches zero-copy, pandas/numpy does the per-batch
  work, and the operator composes with joins/filters before and after
  (predicate pushdown still prunes un-decoded assets);
- REAL codec work (PIL/librosa/av) is import-gated: this container has
  no media libraries, so the codec boundary raises NotImplementedError,
  clearly marked. The Spark-side plumbing — schema, UDF signature,
  batch shape, partitioning — is real and tested against the FAKE1
  deterministic container format below.

FAKE1 container (deterministic stand-in for an image/video codec):
``b"FAKE1" | width:uint32be | height:uint32be | frames:uint32be |
pixels: frames*width*height bytes``. A "frame" is a width×height
grayscale byte plane.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MAGIC = b"FAKE1"

#: Typed metadata carried alongside every binary payload.
MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_frames", T.IntegerType()),
])


def pack_fake_media(width: int, height: int, frames: list[bytes]) -> bytes:
    """Encode a FAKE1 payload (test/fixture helper)."""
    assert all(len(f) == width * height for f in frames)
    return (MAGIC + struct.pack(">III", width, height, len(frames))
            + b"".join(frames))


def _parse_headers_np(bufs: list[bytes]):
    """Vectorized FAKE1 header parse for a whole Arrow batch: one
    ``frombuffer`` over the concatenated fixed-width headers instead of
    per-row struct.unpack — the batch's (w, h, n_frames) come back as a
    single (rows, 3) big-endian uint32 view. Payloads are variable-width
    so they stay per-row; the HEADER is the fixed-width part and the one
    that vectorizes."""
    import numpy as np

    if not bufs:
        return np.empty((0, 3), dtype=np.int64)
    hdr = b"".join(b[:17] for b in bufs)
    if len(hdr) != 17 * len(bufs):
        raise ValueError("not a FAKE1 payload (truncated header)")
    raw = np.frombuffer(hdr, dtype=np.uint8).reshape(len(bufs), 17)
    if not (raw[:, :5] == np.frombuffer(MAGIC, dtype=np.uint8)).all():
        raise ValueError("not a FAKE1 payload")
    return (raw[:, 5:17].copy().view(">u4").reshape(len(bufs), 3)
            .astype(np.int64))


def decode_media(df: DataFrame, content_col: str = "content",
                 codec: str = "fake") -> DataFrame:
    """Decode binary payloads → per-asset metadata + the first frame's
    pixel statistics. ``codec="fake"`` parses FAKE1; real codecs are the
    import-gated path (NotImplementedError here: no media libs in this
    environment — swap in PIL/av on a cluster that has them)."""
    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r} needs a media library (PIL/av/librosa) "
            "not present in this environment; only the deterministic "
            "'fake' FAKE1 codec is available")

    out_schema = T.StructType(
        [f for f in df.schema.fields if f.name != content_col]
        + [T.StructField("meta", MEDIA_META),
           T.StructField("mean_pixel", T.DoubleType()),
           T.StructField("content_sha1", T.StringType())]
    )
    other_cols = [f.name for f in df.schema.fields if f.name != content_col]

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            bufs = [bytes(b) for b in pdf[content_col]]
            whn = _parse_headers_np(bufs)          # (rows, 3), vectorized
            sizes = whn[:, 0] * whn[:, 1]
            means = [
                float(np.frombuffer(b, np.uint8, count=int(sz),
                                    offset=17).mean()) if sz else 0.0
                for b, sz in zip(bufs, sizes)      # frame0 mean: one numpy
            ]                                      # reduction per row
            out = pdf[other_cols].copy()
            out["meta"] = [
                {"media_type": "fake/v1", "width": int(w), "height": int(h),
                 "n_frames": int(n)} for w, h, n in whn]
            out["mean_pixel"] = means
            out["content_sha1"] = [hashlib.sha1(b).hexdigest() for b in bufs]
            yield out[[f.name for f in out_schema.fields]]

    return df.mapInPandas(decode, schema=out_schema)


def sample_frames(df: DataFrame, every_k: int = 2, content_col: str = "content",
                  id_col: str = "media_id") -> DataFrame:
    """Frame sampling: one output row per kept frame (every k-th) — the
    fan-out stage a video pipeline runs before per-frame featurization.
    mapInPandas may emit MORE rows than it receives (unlike a scalar
    pandas UDF), which is exactly the shape frame explosion needs."""
    out_schema = T.StructType([
        df.schema[id_col],
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def explode_frames(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = [bytes(b) for b in pdf[content_col]]
            whn = _parse_headers_np(bufs)          # (rows, 3), vectorized
            ids, idxs, frames = [], [], []
            # zip over column arrays (no per-row Series construction);
            # the slice loop itself is irreducibly per-frame — each kept
            # frame is an independent variable-offset byte slice.
            for mid, buf, (w, h, n) in zip(pdf[id_col].to_numpy(), bufs, whn):
                sz = int(w) * int(h)
                for i in range(0, int(n), every_k):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(buf[17 + i * sz: 17 + (i + 1) * sz])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames},
                               columns=[f.name for f in out_schema.fields])

    return df.mapInPandas(explode_frames, schema=out_schema)


def frame_mean_features(df: DataFrame, content_col: str = "content",
                        center: bool = True) -> DataFrame:
    """Per-frame mean-pixel profile of a FAKE1 payload as
    ``features array<double>`` — the positional "brightness profile"
    that makes media near-dup detection work where a global byte
    histogram cannot: two near-duplicate assets share their profile
    frame by frame, while unrelated assets of the same modality share
    only the global distribution. ``center=True`` subtracts the asset's
    own mean profile value, turning cosine similarity into the
    correlation of profiles (measured on the driver corpus: median
    inter-asset cosine 0.09 centered vs ~0.999 uncentered — the raw
    byte average of same-language payloads swamps the signal).

    Vectorized per Arrow batch: one ``frombuffer`` + reshape + axis
    mean per asset — no per-frame Python loop. Requires every frame to
    be complete (the FAKE1 packer guarantees it)."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def featurize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            bufs = [bytes(b) for b in pdf[content_col]]
            whn = _parse_headers_np(bufs)
            feats = []
            for buf, (w, h, n) in zip(bufs, whn):
                sz = int(w) * int(h)
                px = np.frombuffer(buf, np.uint8, count=sz * int(n),
                                   offset=17).astype(np.float64)
                means = px.reshape(int(n), sz).mean(axis=1)
                if center:
                    means = means - means.mean()
                feats.append(means.tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(featurize, schema=out_schema)


def byte_histogram_features(df: DataFrame, content_col: str = "content",
                            n_bins: int = 16) -> DataFrame:
    """Deterministic per-asset feature vector: normalized byte histogram
    (the embedding stand-in for media payloads). Arrow-batched; output =
    input columns + ``features array<double>``."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("features", T.ArrayType(T.DoubleType()))]
    )

    def featurize(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np
        for pdf in batches:
            feats = []
            for buf in pdf[content_col]:
                arr = np.frombuffer(bytes(buf), dtype=np.uint8)
                # bin = byte * n_bins // 256, vectorized
                idx = (arr.astype(np.uint32) * n_bins) >> 8
                hist = np.bincount(idx, minlength=n_bins)
                feats.append((hist / max(arr.size, 1)).tolist())
            pdf = pdf.copy()
            pdf["features"] = feats
            yield pdf

    return df.mapInPandas(featurize, schema=out_schema)


def binary_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Codec-free binary profile (works on ANY payload): byte length +
    md5. JVM-side built-ins — no Python in the row path — showing binary
    columns flow through ordinary Catalyst expressions too."""
    return df.withColumns({
        "n_bytes": F.octet_length(F.col(content_col)).cast("long"),
        "digest": F.md5(F.col(content_col)),
    })
