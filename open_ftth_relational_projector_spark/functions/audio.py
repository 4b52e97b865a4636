"""Audio modality: REAL 16-bit PCM WAV payloads end to end.

Unlike image codecs (JPEG pixel work needs libraries this container lacks
— multimodal.py documents that boundary), canonical PCM WAV is a
pure-byte-layout format: RIFF header + little-endian int16 frames. So the
audio pipeline here is real at every step, stdlib-only:

  * attach_wav      — synthesize a VALID WAV per document (each ASCII byte
                      of the text becomes one centered PCM sample) — the
                      same synthesis-makes-it-oracle-able trick as
                      multimodal.attach_binary: Spark decodes the actual
                      binary; DuckDB re-derives the numbers from the text.
                      Payloads parse with stdlib ``wave`` (pinned in tests).
  * wav_features    — parse the RIFF header and run real DSP on the
                      samples: duration, peak, RMS energy, zero crossings.
  * resample_wav    — integer-factor decimation + re-encode a valid WAV at
                      the reduced rate.

Scale shape: all three are ``mapInPandas`` over Arrow batches — payloads
cross to Python once per batch, vectorized numpy per row, no per-row
serialization. Joins downstream use the extracted features, never the
blob (same contract as multimodal.py).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

SAMPLE_RATE = 8000

AUDIO_FEATURE_SCHEMA = (
    "doc_id long, n_frames int, sample_rate int, duration_ms int, "
    "peak int, rms double, zero_crossings int"
)

RESAMPLE_SCHEMA = (
    "doc_id long, n_frames_in int, n_frames_out int, sample_rate_out int, "
    "rms_out double"
)


def _text_to_samples(text: str) -> np.ndarray:
    """Deterministic PCM: byte b → (min(b,127) − 64) · 256. ASCII text
    straddles 64 (space=32 < 64 < letters ≥ 97), so real signals cross
    zero; the clamp keeps any non-ASCII byte inside int16."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int32)
    return ((np.minimum(b, 127) - 64) * 256).astype(np.int16)


def encode_wav(samples: np.ndarray, rate: int = SAMPLE_RATE) -> bytes:
    """Canonical 44-byte RIFF/WAVE header + LE int16 mono PCM."""
    data = samples.astype("<i2").tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 samples) from a canonical mono PCM WAV.
    Validates the RIFF/fmt layout rather than trusting offsets blindly."""
    if payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt ":
        raise ValueError("fmt chunk not first")
    fmt_size, audio_fmt, channels, rate, _, _, bits = struct.unpack(
        "<IHHIIHH", payload[16:36]
    )
    if (fmt_size, audio_fmt, channels, bits) != (16, 1, 1, 16):
        raise ValueError("only canonical 16-bit mono PCM supported")
    if payload[36:40] != b"data":
        raise ValueError("data chunk not second")
    (data_len,) = struct.unpack("<I", payload[40:44])
    samples = np.frombuffer(payload[44 : 44 + data_len], dtype="<i2")
    return rate, samples


def attach_wav(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Add a ``wav`` binary column: a real PCM WAV synthesized from the
    document text (one sample per byte, SAMPLE_RATE Hz)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["wav"] = [
                encode_wav(_text_to_samples(t)) for t in pdf[text_col]
            ]
            yield pdf

    fields = ", ".join(
        f"{name} {dtype}"
        for name, dtype in zip(docs.columns, [f.dataType.simpleString() for f in docs.schema.fields])
    )
    return docs.mapInPandas(op, schema=f"{fields}, wav binary")


def wav_features(docs_with_wav: DataFrame) -> DataFrame:
    """Real audio DSP per payload: header metadata + peak/RMS/zero-crossing
    stats on the decoded PCM samples (the standard audio-corpus screens —
    silence/clipping/energy filters — over Arrow batches, numpy per row)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
                rate, s = decode_wav(bytes(payload))
                n = len(s)
                sf = s.astype(np.float64)
                zc = int(np.sum(sf[:-1] * sf[1:] < 0)) if n > 1 else 0
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames": n,
                        "sample_rate": rate,
                        "duration_ms": (n * 1000) // rate,
                        "peak": int(np.max(np.abs(sf))) if n else 0,
                        "rms": round(float(np.sqrt(np.mean(sf * sf))), 4)
                        if n
                        else 0.0,
                        "zero_crossings": zc,
                    }
                )
            yield pd.DataFrame(rows)

    return docs_with_wav.mapInPandas(op, schema=AUDIO_FEATURE_SCHEMA)


def resample_wav(docs_with_wav: DataFrame, factor: int = 2) -> DataFrame:
    """Integer-factor decimation: keep every ``factor``-th sample, re-encode
    a VALID WAV at rate/factor, report the decimated signal's RMS (the
    oracle-checkable invariant of the kept sample set)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["wav"]):
                rate, s = decode_wav(bytes(payload))
                out = s[::factor]
                encode_wav(out, rate // factor)  # real re-encode path
                sf = out.astype(np.float64)
                rows.append(
                    {
                        "doc_id": doc_id,
                        "n_frames_in": len(s),
                        "n_frames_out": len(out),
                        "sample_rate_out": rate // factor,
                        "rms_out": round(
                            float(np.sqrt(np.mean(sf * sf))), 4
                        )
                        if len(out)
                        else 0.0,
                    }
                )
            yield pd.DataFrame(rows)

    return docs_with_wav.mapInPandas(op, schema=RESAMPLE_SCHEMA)
