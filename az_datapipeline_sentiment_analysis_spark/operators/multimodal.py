"""Multimodal (binary) column plumbing.

Images/audio/video are carried as opaque ``binary`` columns with typed
metadata structs. The Spark-side machinery — schema, Arrow batch shape,
``mapInPandas`` signatures, partitioning — is real and tested; the
actual media decode is STUBBED (the image/audio libraries are not in
this container): ``decode_stub=True`` derives deterministic fake
features from the bytes, and ``decode_stub=False`` raises
``NotImplementedError`` where a real decoder (PIL/ffmpeg) would slot in.

At scale: binary payloads dominate row size, so the ops below always
project metadata early (column pruning keeps the binary out of any
stage that doesn't need it) and use ``maxRecordsPerBatch`` to bound
Arrow batch memory when bytes are large.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes long, format string, width long, height long,"
    " checksum string"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fabricate a deterministic binary column (UTF-8 of the text) —
    stands in for image/audio bytes in tests."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def extract_media_meta(df: DataFrame, *, decode_stub: bool = True) -> DataFrame:
    """Per-binary metadata extraction via an Arrow-batched scan.

    Input needs (doc_id, payload: binary). Output MEDIA_META_SCHEMA.
    The fake decode derives width/height/format deterministically from
    the payload hash so tests are stable.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if not decode_stub:
                    raise NotImplementedError(
                        "real media decode requires PIL/ffmpeg; "
                        "not available in this environment"
                    )
                digest = hashlib.md5(b).hexdigest()
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_bytes": len(b),
                        "format": ["png", "jpeg", "webp"][b[0] % 3] if b else "empty",
                        "width": 64 + int(digest[:4], 16) % 1024,
                        "height": 64 + int(digest[4:8], 16) % 1024,
                        "checksum": digest,
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "n_bytes", "format", "width", "height", "checksum",
                ],
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=MEDIA_META_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx long, n_frame_bytes long, frame_bytes binary"
)


def frame_sample(df: DataFrame, *, chunk: int = 256) -> DataFrame:
    """Fixed-stride frame/patch sampling over a binary column.

    The video-frame / audio-window / image-tile primitive: each payload
    is sliced into ``chunk``-byte frames, one output row per frame
    (doc_id, frame_idx, n_frame_bytes, frame_bytes). Row expansion
    happens INSIDE mapInPandas so the binary never round-trips through
    a JVM explode; at scale set ``maxRecordsPerBatch`` to bound Arrow
    batch memory (frames amplify row count by n_bytes/chunk).

    A real decoder would slice on container keyframes instead of byte
    stride — the stub keeps the plumbing (schema, expansion, batch
    shape) identical.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, frames = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for i in range(0, len(b), chunk):
                    piece = b[i : i + chunk]
                    ids.append(doc_id)
                    idxs.append(i // chunk)
                    sizes.append(len(piece))
                    frames.append(piece)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "n_frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_bytes": pd.Series(frames, dtype="object"),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(run, schema=FRAME_SCHEMA)


MEDIA_FEATURES_SCHEMA = "doc_id long, features array<double>"


def media_features(df: DataFrame, *, dim: int = 8) -> DataFrame:
    """Deterministic feature extraction from a binary column.

    Stub for the image/audio embedding step: an 8-bin byte-value
    histogram (normalized) computed with vectorized numpy per Arrow
    batch — the real model (CLIP/wav2vec) would slot into the same
    mapInPandas signature with the same (doc_id, features) output. No
    shuffle: a linear scan, embarrassingly parallel across partitions.
    """
    import numpy as np

    shift = max(0, 8 - (dim - 1).bit_length())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                if not b:
                    feats.append([0.0] * dim)
                    continue
                arr = np.frombuffer(b, dtype=np.uint8) >> shift
                hist = np.bincount(arr, minlength=dim)[:dim]
                feats.append((hist / len(b)).round(6).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "features": feats})

    return df.select("doc_id", "payload").mapInPandas(
        run, schema=MEDIA_FEATURES_SCHEMA
    )
