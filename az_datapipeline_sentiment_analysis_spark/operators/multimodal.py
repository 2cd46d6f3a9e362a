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
