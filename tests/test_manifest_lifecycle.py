"""Manifest lifecycle primitives: CAS commits, AS-OF resolution,
snapshot expiry + vacuum reachability."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from bigdata_spark.sources.manifest import (
    commit_snapshot,
    expire_snapshots,
    list_data_files,
    read_snapshot,
    resolve_asof,
    snapshot_files,
    try_commit_snapshot,
    vacuum,
    versions,
)


def _stage(spark, tmp_path, n=50, files=3):
    base = os.path.join(str(tmp_path), "t")
    spark.range(0, n).select(
        F.col("id"), (F.col("id") % 5).alias("v")
    ).repartition(files).write.parquet(base)
    return base, list_data_files(base)


def test_cas_commit_single_winner(spark, tmp_path):
    base, data = _stage(spark, tmp_path)
    assert try_commit_snapshot(base, 1, data, committed_at=10)
    # second committer loses the same version
    assert not try_commit_snapshot(base, 1, data[:1], committed_at=11)
    # the winner's manifest is intact
    assert sorted(snapshot_files(base, 1)) == sorted(data)
    # retry on the next version succeeds
    assert try_commit_snapshot(base, 2, data, committed_at=12)
    assert versions(base) == [1, 2]


def test_resolve_asof_boundaries(spark, tmp_path):
    base, data = _stage(spark, tmp_path)
    assert try_commit_snapshot(base, 1, data, committed_at=100)
    assert try_commit_snapshot(base, 2, data[:2], committed_at=200)
    assert resolve_asof(base, 100) == 1   # inclusive at the commit time
    assert resolve_asof(base, 199) == 1
    assert resolve_asof(base, 200) == 2
    assert resolve_asof(base, 10**9) == 2
    with pytest.raises(LookupError):
        resolve_asof(base, 99)


def test_expiry_then_vacuum_keeps_reachable_files(spark, tmp_path):
    base, data = _stage(spark, tmp_path, n=60, files=4)
    commit_snapshot(base, 1, data)
    # v2 keeps only half the files (a rewrite that dropped the rest)
    keep = data[:2]
    commit_snapshot(base, 2, keep)
    # nothing is reclaimable while v1 survives
    deleted, n_ref = vacuum(base, retention_secs=0.0)
    assert deleted == [] and n_ref == len(data)
    assert expire_snapshots(base, keep_latest=1) == [1]
    deleted, n_ref = vacuum(base, retention_secs=0.0)
    assert sorted(deleted) == sorted(set(data) - set(keep))
    assert n_ref == len(keep)
    # the surviving snapshot still reads every row of its files
    want = spark.read.parquet(*keep).count()
    assert read_snapshot(spark, base, 2).count() == want


def test_bloom_candidates_no_false_negatives(spark, tmp_path):
    from bigdata_spark.sources.manifest import (
        bloom_candidate_files,
        collect_file_blooms,
    )

    base, data = _stage(spark, tmp_path, n=200, files=5)
    blooms = collect_file_blooms(spark, data, "id")
    commit_snapshot(
        base, 1, data, stats={f: {"bloom": {"id": b}} for f, b in blooms.items()}
    )
    # every live key's true file must be among its candidates
    truth = {
        r["id"]: r["f"]
        for r in spark.read.parquet(*data)
        .select("id", F.input_file_name().alias("f"))
        .collect()
    }
    import urllib.parse

    for key in range(0, 200, 17):
        cand, total = bloom_candidate_files(base, 1, "id", key)
        assert total == 5
        true_file = urllib.parse.unquote(truth[key]).replace("file://", "")
        assert any(os.path.normpath(c) == os.path.normpath(true_file) for c in cand)
    # an absent key should prune at least one file (FP rate ~0.4%)
    cand, _ = bloom_candidate_files(base, 1, "id", 10**9)
    assert len(cand) < 5
