"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode libraries (PIL/librosa/av) are not in this container, so the
decode step is STUBBED: ``decode_image`` raises NotImplementedError unless
``fake=True``, in which case a deterministic fake feature extractor runs.
Everything Spark-side — schema, Arrow batch shape, mapInPandas partitioning —
is real and tested; swapping in a real decoder changes one function body.

Design for 100 TB: binary payloads ride in parquet binary columns (or
path+offset pointers for object-store blobs); feature extraction is
``mapInPandas`` so each Arrow batch is processed vectorized without a
per-row Python crossing; downstream joins use the extracted metadata, never
the blob.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

FEATURE_SCHEMA = "doc_id long, n_bytes long, sha256 string, width int, height int"


def attach_binary(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal corpus: utf-8 payload bytes as the blob column."""
    return docs.withColumn("payload", F.to_binary(F.col(text_col), F.lit("utf-8")))


def decode_image(payload: bytes, fake: bool = False) -> tuple[int, int]:
    """STUB — image decoding needs PIL/opencv, not present in this image.

    fake=True yields deterministic pseudo-dimensions derived from the bytes
    so the pipeline shape can be tested end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "image decode requires a codec library not present in this environment"
        )
    return (len(payload) % 1920) + 1, (len(payload) % 1080) + 1


def extract_features(docs_with_payload: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the binary column.

    Arrow-batched: one pandas DataFrame per batch, vectorized hashing; the
    fake 'decode' stands in for image/audio decoding.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            dims = [decode_image(p, fake=fake) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        op, FEATURE_SCHEMA
    )
