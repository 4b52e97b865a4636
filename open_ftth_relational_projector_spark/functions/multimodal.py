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


FRAME_SCHEMA = "doc_id long, frame_idx int, frame_sha256 string, n_bytes int"


def sample_frames(
    docs_with_payload: DataFrame, frame_bytes: int = 1024, stride: int | None = None
) -> DataFrame:
    """Video-style frame sampling: each payload explodes into one row per
    fixed-size frame (1→N mapInPandas expansion — the output batch is NOT
    row-aligned with the input batch, which is the shape a real frame
    sampler has). A real implementation replaces the byte-slicing with
    codec frame extraction; offsets/stride plumbing stays identical.

    stride defaults to frame_bytes (non-overlapping); a smaller stride
    gives overlapping windows (audio-style hop).
    """
    hop = stride or frame_bytes

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, shas, sizes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                k = 0
                for off in range(0, max(n, 1), hop):
                    chunk = payload[off : off + frame_bytes]
                    if not chunk:
                        break
                    ids.append(doc_id)
                    idxs.append(k)
                    shas.append(hashlib.sha256(chunk).hexdigest())
                    sizes.append(len(chunk))
                    k += 1
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "frame_idx": idxs,
                    "frame_sha256": shas,
                    "n_bytes": sizes,
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        op, FRAME_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, target_w int, target_h int, "
    "resized_sha256 string"
)


def resize_images(
    docs_with_payload: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    fake: bool = True,
) -> DataFrame:
    """STUB resize: a real implementation decodes, resamples, re-encodes;
    the deterministic fake hashes payload ⊕ target geometry so tests (and
    the DuckDB oracle) can pin the full input→output contract. Output
    keeps source + target dims — the metadata a training pipeline filters
    and buckets on without touching blobs."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        tag = f"{target_w}x{target_h}".encode()
        for pdf in batches:
            dims = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "target_w": target_w,
                    "target_h": target_h,
                    "resized_sha256": [
                        hashlib.sha256(bytes(p) + tag).hexdigest()
                        for p in pdf["payload"]
                    ],
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        op, RESIZE_SCHEMA
    )
