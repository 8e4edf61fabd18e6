"""Manifest-based snapshot versioning — the table-format core trick
(Iceberg/Delta snapshot isolation) in its minimal form: data files are
immutable; a VERSION is a JSON manifest listing exactly the files that
belong to it; readers plan from the manifest, never from directory
listing. Time travel is therefore free (keep old manifests), commits
are atomic (one manifest write), and concurrent readers of v1 are
unaffected by a v2 commit.

Scale notes: at 100 TB the manifest lists file-level stats for pruning
(min/max per column — here file row counts) and lives on object
storage; the reader still turns ONE manifest read into a direct
parquet scan plan, exactly as below. Reference intent: the reference's
model source/sink pair (code/src/model_manager) persists versioned
artifacts; this generalizes the idea to table data.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(table_path: str) -> str:
    return os.path.join(table_path, "_manifests")


def list_data_files(root: str) -> list[str]:
    """Every parquet part-file under ``root`` (recursive, sorted)."""
    out: list[str] = []
    for dirpath, _dirs, files in os.walk(root):
        if "_manifests" in dirpath:
            continue
        for f in files:
            if f.endswith(".parquet") and not f.startswith("_"):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


def commit_snapshot(table_path: str, version: int, files: list[str]) -> str:
    """Atomically publish ``files`` as snapshot ``version`` (one JSON
    write + rename; the data files themselves are already immutable)."""
    mdir = _manifest_dir(table_path)
    os.makedirs(mdir, exist_ok=True)
    rel = sorted(os.path.relpath(f, table_path) for f in files)
    tmp = os.path.join(mdir, f".v{version}.json.tmp")
    final = os.path.join(mdir, f"v{version}.json")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "files": rel}, fh)
    os.replace(tmp, final)  # atomic commit
    return final


def snapshot_files(table_path: str, version: int) -> list[str]:
    with open(os.path.join(_manifest_dir(table_path), f"v{version}.json")) as fh:
        m = json.load(fh)
    return [os.path.join(table_path, f) for f in m["files"]]


def read_snapshot(spark: SparkSession, table_path: str, version: int) -> DataFrame:
    """Plan a scan over exactly the files of ``version`` — no directory
    listing, so files added by later commits are invisible (snapshot
    isolation) and dropped files stay readable (time travel).
    ``basePath`` keeps hive-style partition columns resolvable when
    individual part-files are named directly."""
    return (
        spark.read.option("basePath", table_path)
        .parquet(*snapshot_files(table_path, version))
    )


def versions(table_path: str) -> list[int]:
    mdir = _manifest_dir(table_path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)
