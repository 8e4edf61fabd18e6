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


def test_expire_all_requires_explicit_flag(spark, tmp_path):
    base, data = _stage(spark, tmp_path)
    commit_snapshot(base, 1, data)
    with pytest.raises(ValueError):
        expire_snapshots(base, keep_latest=0)
    assert versions(base) == [1]
    assert expire_snapshots(base, keep_latest=0, expire_all=True) == [1]
    assert versions(base) == []


def test_vacuum_retention_keeps_young_staged_files(spark, tmp_path):
    """A file staged into the table dir before its CAS commit must
    survive a concurrent vacuum: the default retention window skips
    young unreferenced files; only an explicit retention_secs=0.0
    reclaims them immediately."""
    base, data = _stage(spark, tmp_path, files=2)
    commit_snapshot(base, 1, data[:1])  # second file unreferenced
    deleted, _ = vacuum(base)  # default retention: file is seconds old
    assert deleted == []
    deleted, _ = vacuum(base, retention_secs=0.0)
    assert deleted == [data[1]]


def test_bloom_sized_from_file_key_count(spark, tmp_path):
    from bigdata_spark.sources.manifest import (
        _BLOOM_MIN_BITS,
        _bloom_size_bits,
        bloom_candidate_files,
        collect_file_blooms,
    )

    assert _bloom_size_bits(10) == _BLOOM_MIN_BITS
    assert _bloom_size_bits(200_000) >= 200_000 * 10
    assert _bloom_size_bits(200_000) & (_bloom_size_bits(200_000) - 1) == 0

    base, data = _stage(spark, tmp_path, n=400, files=2)
    blooms = collect_file_blooms(spark, data, "id")
    for b in blooms.values():
        assert set(b) == {"m", "k", "bits"}
        assert b["m"] == _BLOOM_MIN_BITS  # 200 keys → floor size
    commit_snapshot(
        base, 1, data,
        stats={f: {"bloom": {"id": b}} for f, b in blooms.items()},
    )
    # no false negatives: every present key must keep its file
    for key in (0, 199, 399):
        cand, total = bloom_candidate_files(base, 1, "id", key)
        assert total == 2
        got = {
            r["id"]
            for r in spark.read.parquet(*cand)
            .filter(F.col("id") == key)
            .collect()
        }
        assert got == {key}


def test_equality_deletes_apply_and_vacuum_reachability(spark, tmp_path):
    from bigdata_spark.sources.manifest import (
        read_snapshot_with_deletes,
        snapshot_equality_deletes,
    )

    base, data = _stage(spark, tmp_path, n=60, files=2)
    commit_snapshot(base, 1, data)
    eq_dir = os.path.join(base, "eq")
    spark.createDataFrame([(1,), (3,)], "v long").write.parquet(eq_dir)
    eq_files = [f for f in list_data_files(base) if f not in set(data)]
    commit_snapshot(base, 2, data, equality_deletes=(eq_files, ["v"]))

    got = read_snapshot_with_deletes(spark, base, 2)
    ids = sorted(r["id"] for r in got.collect())
    assert ids == sorted(i for i in range(60) if i % 5 not in (1, 3))
    files, keys = snapshot_equality_deletes(base, 2)
    assert keys == ["v"] and len(files) == len(eq_files)
    # the sidecar is reachable: vacuum must not reclaim it
    deleted, _ = vacuum(base, retention_secs=0.0)
    assert deleted == []


def test_dv_keys_survive_table_rename(spark, tmp_path):
    """Root-relative file keys: renaming/moving the table directory
    must not orphan deletion vectors — the anti-join still masks the
    deleted rows when reading from the NEW root."""
    import shutil

    from bigdata_spark.sources.manifest import (
        file_key_col,
        read_snapshot_with_deletes,
    )

    base, data = _stage(spark, tmp_path, n=40, files=2)
    v1 = spark.read.option("basePath", base).parquet(*data)
    dv_dir = os.path.join(str(tmp_path), "dv")
    (
        v1.filter(F.col("id") % 4 == 0)
        .select(
            file_key_col(base).alias("file_key"),
            F.col("_metadata.row_index").alias("pos"),
        )
        .repartition(1)
        .write.parquet(dv_dir)
    )
    dv_files = [
        os.path.join(dv_dir, f)
        for f in os.listdir(dv_dir)
        if f.endswith(".parquet")
    ]
    # move the DV inside the table, commit, then RENAME the table root
    dv_in = os.path.join(base, "dv2")
    shutil.copytree(dv_dir, dv_in)
    dv_in_files = [
        os.path.join(dv_in, f)
        for f in os.listdir(dv_in)
        if f.endswith(".parquet")
    ]
    commit_snapshot(base, 1, data, delete_files=dv_in_files)
    new_base = os.path.join(str(tmp_path), "renamed_table")
    os.rename(base, new_base)
    got = read_snapshot_with_deletes(spark, new_base, 1)
    ids = sorted(r["id"] for r in got.collect())
    assert ids == [i for i in range(40) if i % 4 != 0]


def test_multi_table_transaction_cas_and_resolution(spark, tmp_path):
    from bigdata_spark.sources.manifest import (
        resolve_transaction,
        transaction_ids,
        try_commit_transaction,
    )

    root = os.path.join(str(tmp_path), "db")
    fact = os.path.join(root, "fact")
    spark.range(0, 10).write.parquet(fact)
    f = list_data_files(fact)
    commit_snapshot(fact, 1, f)
    assert try_commit_transaction(root, 1, {"fact": 1, "mv": 1})
    # same txn id: single winner, loser's doc is NOT published
    assert not try_commit_transaction(root, 1, {"fact": 99, "mv": 99})
    assert resolve_transaction(root) == {"fact": 1, "mv": 1}
    assert try_commit_transaction(root, 2, {"fact": 2, "mv": 2})
    assert transaction_ids(root) == [1, 2]
    assert resolve_transaction(root) == {"fact": 2, "mv": 2}
    assert resolve_transaction(root, 1) == {"fact": 1, "mv": 1}
    with pytest.raises(LookupError):
        resolve_transaction(os.path.join(str(tmp_path), "empty"))
