"""Audio modality: real PCM WAV decode + DSP.

Split out of the single-file catalog (round-4 verdict #6); registration
order preserved — see catalog/__init__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, Window as W  # noqa: F401

from open_ftth_relational_projector_spark.sources.tables import load_table, scattered  # noqa: F401
from open_ftth_relational_projector_spark.events.reader import EventLog  # noqa: F401
from open_ftth_relational_projector_spark.operators import asof_join, latest_by_key  # noqa: F401
from open_ftth_relational_projector_spark.functions import dedup as D  # noqa: F401
from open_ftth_relational_projector_spark.functions import similarity as S  # noqa: F401
from open_ftth_relational_projector_spark.functions import text as TXT  # noqa: F401
from open_ftth_relational_projector_spark.functions.multimodal import (  # noqa: F401
    attach_binary,
    extract_features,
)
from open_ftth_relational_projector_spark.projections.core import (  # noqa: F401
    project_installation,
    project_work_task,
)

from ._registry import _q, _r4  # noqa: F401

# --- audio modality: real PCM WAV decode + DSP -----------------------------
# The synthesis rule (byte → (min(b,127)−64)·256) lets DuckDB re-derive
# every DSP number from the TEXT while Spark decodes the actual WAV binary
# — the same differential trick as multimodal_features, but here the
# binary format itself is fully real (stdlib `wave` parses the payloads,
# pinned in tests).

@_q(
    "audio_wav_features",
    """
    WITH sm AS (
      SELECT doc_id,
             [(LEAST(ascii(text[i]), 127) - 64) * 256
              FOR i IN range(1, length(text) + 1)] AS s
      FROM documents)
    SELECT doc_id,
           CAST(len(s) AS INT) AS n_frames,
           CAST(8000 AS INT) AS sample_rate,
           CAST((len(s) * 1000) // 8000 AS INT) AS duration_ms,
           CAST(list_max(list_transform(s, x -> abs(x))) AS INT) AS peak,
           ROUND(sqrt(list_avg(list_transform(s,
                 x -> CAST(x AS DOUBLE) * x))), 4) AS rms,
           CAST(len([i FOR i IN range(1, len(s)) IF s[i] * s[i+1] < 0])
             AS INT) AS zero_crossings
    FROM sm
    """,
)
def audio_wav_features_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio-corpus screens (silence/clipping/energy): RIFF header
    parse + numpy DSP over decoded PCM (functions/audio.wav_features on
    attach_wav payloads)."""
    from open_ftth_relational_projector_spark.functions.audio import (
        attach_wav,
        wav_features,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    return wav_features(attach_wav(docs))


@_q(
    "audio_wav_resample",
    """
    WITH sm AS (
      SELECT doc_id,
             [(LEAST(ascii(text[i]), 127) - 64) * 256
              FOR i IN range(1, length(text) + 1)] AS s
      FROM documents),
    dec AS (
      SELECT doc_id, len(s) AS n_in,
             [s[i] FOR i IN range(1, len(s) + 1) IF (i - 1) % 2 = 0] AS d
      FROM sm)
    SELECT doc_id,
           CAST(n_in AS INT) AS n_frames_in,
           CAST(len(d) AS INT) AS n_frames_out,
           CAST(4000 AS INT) AS sample_rate_out,
           ROUND(sqrt(list_avg(list_transform(d,
                 x -> CAST(x AS DOUBLE) * x))), 4) AS rms_out
    FROM dec
    """,
)
def audio_wav_resample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-factor decimation to a re-encoded valid WAV at half the
    rate (functions/audio.resample_wav); the oracle replays the kept
    sample set's RMS."""
    from open_ftth_relational_projector_spark.functions.audio import (
        attach_wav,
        resample_wav,
    )

    docs = scattered(load_table(spark, sf_dir, "documents"))
    return resample_wav(attach_wav(docs), factor=2)


