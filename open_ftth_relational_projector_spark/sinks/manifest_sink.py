"""Manifest-committed parquet sink: atomic publish over eventually-
consistent storage — the minimal form of the lakehouse commit protocol
(Delta/Iceberg's core idea: readers trust a MANIFEST, never a directory
listing).

Write path: data files land under ``data/`` with a unique version prefix;
the commit is ONE atomic rename of ``_manifest.<version>.json.tmp`` →
``_manifest.json`` listing exactly the files of that version. A writer
that crashes after landing data files but BEFORE the manifest swap leaves
orphans that no reader will ever see — torn writes are impossible by
construction, which is the storage-layer half of effective exactly-once
(the engine half is the idempotent MERGE in sinks/jdbc_sink.py, T5).

Read path: parse ``_manifest.json``, read exactly those files. A
concurrent writer can land any number of data files without affecting
readers until its single rename.

At 100 TB the same protocol holds — the manifest is small (file list +
stats), the rename is the only operation that must be atomic, and object
stores provide that via put-if-absent/rename semantics. Orphan files are
reclaimed by a janitor comparing the listing against the manifest chain
(``vacuum_orphans``).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(path: str) -> str:
    return os.path.join(path, "_manifest.json")


def write_versioned(df: DataFrame, path: str, version: int) -> list[str]:
    """Land the data files for ``version`` and atomically publish them.
    Returns the committed file list."""
    staging = os.path.join(path, "data", f"v{version}-{uuid.uuid4().hex[:8]}")
    df.write.mode("overwrite").parquet(staging)
    files = sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )
    tmp = _manifest_path(path) + f".v{version}.tmp"
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": files}, fh)
    # archive the version manifest FIRST (time travel), then the atomic
    # swap of the current pointer — a crash between the two leaves the
    # archive ahead of the pointer, which is harmless (never the reverse)
    with open(os.path.join(path, f"_manifest.v{version}.json"), "w") as fh:
        json.dump({"version": version, "files": files}, fh)
    os.replace(tmp, _manifest_path(path))  # the single atomic commit
    return files


def land_uncommitted(df: DataFrame, path: str, version: int) -> list[str]:
    """Simulate a writer crash: data files land, the manifest swap never
    happens. Readers must not observe these files."""
    staging = os.path.join(path, "data", f"v{version}-crashed")
    df.write.mode("overwrite").parquet(staging)
    return sorted(
        os.path.join(staging, f)
        for f in os.listdir(staging)
        if f.endswith(".parquet")
    )


def read_committed(spark: SparkSession, path: str) -> DataFrame:
    """Read exactly the files the manifest names — never the directory."""
    with open(_manifest_path(path)) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(*manifest["files"])


def committed_version(path: str) -> int:
    with open(_manifest_path(path)) as fh:
        return int(json.load(fh)["version"])


def vacuum_orphans(path: str) -> list[str]:
    """Delete data files not referenced by the current manifest; returns
    the removed paths (the janitor half of the protocol)."""
    with open(_manifest_path(path)) as fh:
        keep = set(json.load(fh)["files"])
    removed = []
    data_root = os.path.join(path, "data")
    for root, _dirs, files in os.walk(data_root):
        for f in files:
            p = os.path.join(root, f)
            if f.endswith(".parquet") and p not in keep:
                os.remove(p)
                removed.append(p)
    return sorted(removed)


def compact(
    spark: SparkSession, path: str, target_files: int
) -> tuple[int, int]:
    """Small-files compaction: rewrite the committed data into
    ``target_files`` parquet files and publish as the next version with
    the same atomic manifest swap — readers flip between the pre- and
    post-compaction file sets with no window where either is torn. The
    replaced files become orphans for ``vacuum_orphans``.

    Returns (n_files_before, n_files_after). At 100 TB this is the
    maintenance job that keeps scan task counts sane after many small
    incremental commits; target_files is chosen so one file ≈ one task's
    worth (the same sizing rule as sources/bucketing.py).
    """
    with open(_manifest_path(path)) as fh:
        manifest = json.load(fh)
    before = len(manifest["files"])
    df = spark.read.parquet(*manifest["files"]).coalesce(target_files)
    files = write_versioned(df, path, manifest["version"] + 1)
    return before, len(files)


def read_version(spark: SparkSession, path: str, version: int) -> DataFrame:
    """Time travel: read a PRIOR committed version from its archived
    manifest. Works as long as its files haven't been vacuumed — exactly
    the Delta/Iceberg retention contract (vacuum_orphans keeps only the
    CURRENT version; a retention-aware vacuum would keep the trailing N
    manifests' files)."""
    with open(os.path.join(path, f"_manifest.v{version}.json")) as fh:
        manifest = json.load(fh)
    return spark.read.parquet(*manifest["files"])
