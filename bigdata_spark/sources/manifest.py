"""Manifest-based snapshot versioning — the table-format core trick
(Iceberg/Delta snapshot isolation) in its minimal form: data files are
immutable; a VERSION is a JSON manifest listing exactly the files that
belong to it; readers plan from the manifest, never from directory
listing. Time travel is therefore free (keep old manifests), commits
are atomic (one manifest write), and concurrent readers of v1 are
unaffected by a v2 commit.

Scale notes: at 100 TB the manifest lists file-level stats for pruning
— per-column min/max harvested from the parquet FOOTERS (a metadata
pass, no data rows read) — and lives on object storage; the reader
still turns ONE manifest read into a direct parquet scan plan, and
``read_snapshot_pruned`` drops every file whose [min, max] cannot
intersect the predicate before Spark ever plans it. Stats collection
is itself distributed (``mapInPandas`` over the file list; only the
file-count-sized stats table returns to the driver — the same
cardinality the manifest already is). Reference intent: the
reference's model source/sink pair (code/src/model_manager) persists
versioned artifacts; this generalizes the idea to table data.
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


def collect_file_stats(
    spark: SparkSession, files: list[str], columns: list[str]
) -> dict[str, dict]:
    """Per-file footer stats for the manifest: {path: {"rows": n,
    "cols": {col: [min, max]}}} — numeric/string min-max straight from
    the parquet row-group metadata, NO data pages read. The footer
    walk fans out as one Spark task per chunk of the file list; only
    the file-count-sized stats table (the manifest's own cardinality)
    returns to the driver."""

    def _stats(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                colstats: dict[str, list] = {}
                for rg in range(md.num_row_groups):
                    for ci in range(md.num_columns):
                        col = md.row_group(rg).column(ci)
                        name = col.path_in_schema
                        if name not in columns:
                            continue
                        st = col.statistics
                        if st is None or not st.has_min_max:
                            colstats[name] = None  # unknown → never prune
                            continue
                        if colstats.get(name, ()) is None:
                            continue
                        lo, hi = st.min, st.max
                        cur = colstats.get(name)
                        colstats[name] = (
                            [min(lo, cur[0]), max(hi, cur[1])] if cur else [lo, hi]
                        )
                out.append(
                    (path, md.num_rows, json.dumps(colstats, default=str))
                )
            yield pd.DataFrame(out, columns=["path", "rows", "cols"])

    df = spark.createDataFrame([(f,) for f in files], "path string")
    rows = df.repartition(max(1, min(len(files), 64))).mapInPandas(
        _stats, "path string, rows long, cols string"
    ).collect()
    return {
        r["path"]: {"rows": int(r["rows"]), "cols": json.loads(r["cols"])}
        for r in rows
    }


def commit_snapshot(
    table_path: str,
    version: int,
    files: list[str],
    stats: dict[str, dict] | None = None,
    delete_files: list[str] | None = None,
    equality_deletes: tuple[list[str], list[str]] | None = None,
) -> str:
    """Atomically publish ``files`` as snapshot ``version`` (one JSON
    write + rename; the data files themselves are already immutable).
    ``stats`` (from :func:`collect_file_stats`) rides along keyed by
    the same relative paths and powers predicate file-pruning.
    ``delete_files`` registers POSITIONAL deletion-vector sidecars
    (parquet files of (file_key, pos) rows — see
    :func:`read_snapshot_with_deletes`) that logically remove
    individual rows from the listed data files without rewriting them
    — the Delta deletion-vector / Iceberg positional-delete commit
    shape. ``equality_deletes`` is the OTHER half of production
    row-level deletes, the Iceberg equality-delete shape: a
    ``(sidecar_files, key_columns)`` pair where each sidecar holds
    key-column VALUES whose matching rows are logically removed —
    cheaper to write under churn (no read-modify-write to find
    positions; the writer never opens a data file) and applied
    merge-on-read as an anti-join on the key
    (:func:`read_snapshot_with_deletes` applies both kinds). Older
    readers that ignore the keys see the pre-delete rows (the format
    is forward-compatible)."""
    mdir = _manifest_dir(table_path)
    os.makedirs(mdir, exist_ok=True)
    rel = sorted(os.path.relpath(f, table_path) for f in files)
    doc: dict = {"version": version, "files": rel}
    if stats:
        doc["stats"] = {
            os.path.relpath(f, table_path): s for f, s in stats.items()
        }
    if delete_files:
        doc["deletes"] = sorted(
            os.path.relpath(f, table_path) for f in delete_files
        )
    if equality_deletes:
        eq_files, eq_keys = equality_deletes
        doc["eq_deletes"] = {
            "files": sorted(
                os.path.relpath(f, table_path) for f in eq_files
            ),
            "keys": list(eq_keys),
        }
    tmp = os.path.join(mdir, f".v{version}.json.tmp")
    final = os.path.join(mdir, f"v{version}.json")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
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


def read_snapshot_pruned(
    spark: SparkSession,
    table_path: str,
    version: int,
    column: str,
    lo=None,
    hi=None,
) -> tuple[DataFrame, int, int]:
    """Manifest-stats file pruning: plan a scan over ONLY the files of
    ``version`` whose footer [min, max] for ``column`` can intersect
    [lo, hi] (either bound may be None = unbounded). Files without
    recorded stats are kept — pruning is safe, never lossy. Returns
    (frame, n_files_total, n_files_read); the caller still applies the
    row-level predicate — pruning only shrinks the file list, exactly
    like an Iceberg/Delta reader. The manifest read is ONE metadata
    fetch; no directory listing, no footer reads at query time."""
    with open(os.path.join(_manifest_dir(table_path), f"v{version}.json")) as fh:
        m = json.load(fh)
    stats = m.get("stats", {})
    keep: list[str] = []
    for rel in m["files"]:
        s = stats.get(rel, {}).get("cols", {}).get(column)
        if s is not None:
            fmin, fmax = s
            if (hi is not None and fmin > hi) or (lo is not None and fmax < lo):
                continue  # cannot intersect the predicate — skip the file
        keep.append(rel)
    if not keep and m["files"]:
        # every file pruned: keep one so the scan still has a schema —
        # the caller's row-level predicate yields the (correct) empty
        # result; n_files_read stays 0 because no file COULD match
        df = (
            spark.read.option("basePath", table_path)
            .parquet(os.path.join(table_path, m["files"][0]))
            .limit(0)
        )
        return df, len(m["files"]), 0
    df = spark.read.option("basePath", table_path).parquet(
        *(os.path.join(table_path, f) for f in keep)
    )
    return df, len(m["files"]), len(keep)


_BLOOM_BITS = 1 << 18  # legacy default (pre-sized filters only)
_BLOOM_K = 4
_BLOOM_BITS_PER_KEY = 10  # ~1% FP at k=4; m rounds up to a power of two
_BLOOM_MIN_BITS = 1 << 12


def _bloom_size_bits(n_keys: int) -> int:
    """Per-file filter size: ≥10 bits/key rounded up to a power of two
    (floored at 4 KiB). Fixed-size filters saturate as files grow —
    at ~187k keys a 2^18 filter hits ~94% bit fill and ~79% FP per
    probe, destroying pruning; sizing from the actual key count keeps
    FP ~1% at every scale factor."""
    need = max(_BLOOM_MIN_BITS, n_keys * _BLOOM_BITS_PER_KEY)
    return 1 << (need - 1).bit_length()


def _bloom_positions(keys, m_bits: int = _BLOOM_BITS, k: int = _BLOOM_K):
    """k bit positions per int64 key — vectorized splitmix-style double
    hashing (build and probe MUST share this function: the bloom's
    no-false-negative guarantee is structural, nothing else about the
    hash needs to be portable — result correctness never depends on
    the filter, only the candidate set does)."""
    import numpy as np

    x = np.asarray(keys, dtype=np.uint64)
    h = (x + np.uint64(0x9E3779B97F4A7C15)) * np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(31)
    h2 = (h ^ (x * np.uint64(0x94D049BB133111EB))) | np.uint64(1)
    return [
        ((h + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
        for i in range(k)
    ]


def collect_file_blooms(
    spark: SparkSession, files: list[str], column: str
) -> dict[str, dict]:
    """Per-file BLOOM filters over an int64 key column — the pruning
    mode min/max stats cannot provide: on a hash/round-robin layout
    every file's [min, max] spans the whole key domain, but a point
    lookup probes each file's bloom and reads only the (usually one)
    file that can contain the key. One Spark task per file chunk reads
    just the key column; only file-count-sized hex bitmaps return to
    the driver (manifest cardinality, like collect_file_stats).

    Each filter is SIZED FROM ITS FILE's key count
    (:func:`_bloom_size_bits`) and the manifest entry records (m, k)
    beside the bitmap so probes always use the matching parameters —
    a fixed-size filter silently saturates as per-file rows grow with
    the scale factor. Returns {path: {"m": bits, "k": hashes,
    "bits": hex}}."""

    def _blooms(batches):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                keys = (
                    pq.read_table(path, columns=[column])
                    .column(column)
                    .to_numpy()
                )
                m = _bloom_size_bits(len(keys))
                bits = np.zeros(m, dtype=bool)
                for pos in _bloom_positions(keys, m_bits=m):
                    bits[pos] = True
                out.append(
                    (path, m, _BLOOM_K, np.packbits(bits).tobytes().hex())
                )
            yield pd.DataFrame(out, columns=["path", "m", "k", "bits"])

    df = spark.createDataFrame([(f,) for f in files], "path string")
    rows = (
        df.repartition(max(1, min(len(files), 64)))
        .mapInPandas(_blooms, "path string, m long, k long, bits string")
        .collect()
    )
    return {
        r["path"]: {"m": int(r["m"]), "k": int(r["k"]), "bits": r["bits"]}
        for r in rows
    }


def bloom_candidate_files(
    table_path: str, version: int, column: str, key: int
) -> tuple[list[str], int]:
    """Files of ``version`` whose committed bloom for ``column`` may
    contain ``key`` (files without a bloom are kept — pruning is safe,
    never lossy). Each probe uses the (m, k) the manifest recorded
    NEXT TO that file's bitmap (filters are sized per file; a probe
    with the wrong m would be garbage). Legacy plain-hex entries probe
    with the legacy fixed parameters. Returns (candidates,
    n_files_total). One manifest read, no data touched."""
    import numpy as np

    with open(
        os.path.join(_manifest_dir(table_path), f"v{version}.json")
    ) as fh:
        m = json.load(fh)
    keep = []
    for rel in m["files"]:
        bl = m.get("stats", {}).get(rel, {}).get("bloom", {}).get(column)
        if bl is not None:
            if isinstance(bl, dict):
                m_bits, k, hexbits = bl["m"], bl["k"], bl["bits"]
            else:  # legacy fixed-size entry
                m_bits, k, hexbits = _BLOOM_BITS, _BLOOM_K, bl
            probes = [
                int(p[0])
                for p in _bloom_positions(
                    np.array([key]), m_bits=m_bits, k=k
                )
            ]
            raw = bytes.fromhex(hexbits)
            if not all(raw[p // 8] & (0x80 >> (p % 8)) for p in probes):
                continue  # definitely absent from this file
        keep.append(os.path.join(table_path, rel))
    return keep, len(m["files"])


def try_commit_snapshot(
    table_path: str,
    version: int,
    files: list[str],
    delete_files: list[str] | None = None,
    committed_at: int | None = None,
) -> bool:
    """OPTIMISTIC-CONCURRENCY commit: atomically publish ``version``
    ONLY if no committer got there first — the create-exclusive link
    (``os.link`` onto an existing name raises) is the single-winner
    compare-and-swap every table format builds its transaction model
    on. Returns False on conflict; the loser re-reads the new current
    version, checks its base files still stand, and retries on the
    next version number (the caller's rebase loop).
    ``committed_at`` is a logical commit timestamp enabling
    AS-OF-time reads (:func:`resolve_asof`)."""
    mdir = _manifest_dir(table_path)
    os.makedirs(mdir, exist_ok=True)
    rel = sorted(os.path.relpath(f, table_path) for f in files)
    doc: dict = {"version": version, "files": rel}
    if delete_files:
        doc["deletes"] = sorted(
            os.path.relpath(f, table_path) for f in delete_files
        )
    if committed_at is not None:
        doc["committed_at"] = int(committed_at)
    # tmp name unique PER CALL (not just per pid): two threads in one
    # process racing the same version must not share a staging path, or
    # the second open() truncates the first writer's staged manifest
    # before its os.link and the CAS winner publishes the loser's doc
    import uuid

    tmp = os.path.join(
        mdir, f".v{version}.{os.getpid()}.{uuid.uuid4().hex}.json.tmp"
    )
    final = os.path.join(mdir, f"v{version}.json")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    try:
        os.link(tmp, final)  # fails iff the version already exists
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def _txn_dir(root: str) -> str:
    return os.path.join(root, "_txns")


def try_commit_transaction(
    root: str, txn_id: int, table_versions: dict[str, int]
) -> bool:
    """MULTI-TABLE atomic commit: one CAS (the same create-exclusive
    link as :func:`try_commit_snapshot`) publishes a transaction doc
    mapping each participating table (path relative to ``root``) to
    the snapshot version this transaction makes current. Readers that
    resolve EVERY table through the latest transaction
    (:func:`resolve_transaction`) can never observe table A at the new
    version with table B at the old one — cross-table consistency
    (fact + derived MV, double-entry pairs) rides one metadata op.

    Each table's own snapshot manifest must already be staged via its
    per-table commit; a staged snapshot referenced by no committed
    transaction is unreachable metadata (harmless, vacuumable). A
    loser re-resolves the current transaction, re-derives anything
    that depends on the other tables' new state (a derived table's
    rebase is a recompute, not metadata-only), re-stages, and retries
    on the next txn id. Returns False on conflict."""
    import uuid

    tdir = _txn_dir(root)
    os.makedirs(tdir, exist_ok=True)
    doc = {"txn": txn_id, "tables": dict(table_versions)}
    tmp = os.path.join(
        tdir, f".t{txn_id}.{os.getpid()}.{uuid.uuid4().hex}.json.tmp"
    )
    final = os.path.join(tdir, f"t{txn_id}.json")
    with open(tmp, "w") as fh:
        json.dump(doc, fh)
    try:
        os.link(tmp, final)  # fails iff the txn id already exists
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


def transaction_ids(root: str) -> list[int]:
    tdir = _txn_dir(root)
    if not os.path.isdir(tdir):
        return []
    return sorted(
        int(f[1:-5])
        for f in os.listdir(tdir)
        if f.startswith("t") and f.endswith(".json")
    )


def resolve_transaction(
    root: str, txn_id: int | None = None
) -> dict[str, int]:
    """The {table: version} map of transaction ``txn_id`` (default:
    the latest committed transaction)."""
    if txn_id is None:
        ids = transaction_ids(root)
        if not ids:
            raise LookupError(f"no committed transaction under {root}")
        txn_id = ids[-1]
    with open(os.path.join(_txn_dir(root), f"t{txn_id}.json")) as fh:
        return json.load(fh)["tables"]


def resolve_asof(table_path: str, ts: int) -> int:
    """Largest committed version whose ``committed_at`` ≤ ``ts`` —
    AS-OF-timestamp time travel over the manifest log (one metadata
    directory listing; versions without a timestamp are ignored)."""
    best = None
    mdir = _manifest_dir(table_path)
    for f in os.listdir(mdir):
        if not (f.startswith("v") and f.endswith(".json")):
            continue
        with open(os.path.join(mdir, f)) as fh:
            m = json.load(fh)
        at = m.get("committed_at")
        if at is not None and at <= ts:
            if best is None or m["version"] > best:
                best = m["version"]
    if best is None:
        raise LookupError(f"no snapshot committed at or before ts={ts}")
    return best


def expire_snapshots(
    table_path: str, keep_latest: int, expire_all: bool = False
) -> list[int]:
    """Drop all but the newest ``keep_latest`` manifests (the
    retention policy step that makes :func:`vacuum` able to reclaim
    anything). Data files are untouched — expiry is pure metadata.
    ``keep_latest <= 0`` would drop EVERY manifest, after which a
    vacuum erases the whole table — rejected unless the caller
    explicitly passes ``expire_all=True`` (the drop-table intent)."""
    if keep_latest <= 0 and not expire_all:
        raise ValueError(
            "keep_latest <= 0 expires every snapshot (a subsequent"
            " vacuum would erase the table); pass expire_all=True to"
            " confirm"
        )
    vs = versions(table_path)
    drop = vs[:-keep_latest] if keep_latest > 0 else vs
    for v in drop:
        os.remove(os.path.join(_manifest_dir(table_path), f"v{v}.json"))
    return drop


def vacuum(
    table_path: str, retention_secs: float = 86400.0
) -> tuple[list[str], int]:
    """Delete every data/DV file under the table root that NO
    surviving manifest references — the garbage-collection half of
    snapshot expiry. Safety is structural in two ways: (1) the
    reachable set is the union over every remaining manifest's
    ``files`` + ``deletes``, so a file any live snapshot can still
    plan stays on disk; (2) unreferenced files YOUNGER than
    ``retention_secs`` are kept (the Delta
    ``deletedFileRetentionDuration`` shape) — a writer stages its data
    file into the table directory BEFORE its CAS commit
    (:func:`try_commit_snapshot`), so a concurrent vacuum with no age
    guard would delete an in-flight commit's file. Tests/benchmarks
    that own the table exclusively pass ``retention_secs=0.0``
    explicitly. Returns (deleted paths, n files referenced)."""
    import time

    referenced: set[str] = set()
    for v in versions(table_path):
        with open(
            os.path.join(_manifest_dir(table_path), f"v{v}.json")
        ) as fh:
            m = json.load(fh)
        for f in (
            m["files"]
            + m.get("deletes", [])
            + m.get("eq_deletes", {}).get("files", [])
        ):
            referenced.add(os.path.normpath(os.path.join(table_path, f)))
    deleted = []
    horizon = time.time() - retention_secs
    for f in list_data_files(table_path):
        if os.path.normpath(f) in referenced:
            continue
        if os.path.getmtime(f) > horizon:
            continue  # younger than the retention window — maybe staged
        os.remove(f)
        deleted.append(f)
    return deleted, len(referenced)


def snapshot_equality_deletes(
    table_path: str, version: int
) -> tuple[list[str], list[str]]:
    """(sidecar paths, key columns) of the equality deletes registered
    by snapshot ``version`` (([], []) when none)."""
    with open(
        os.path.join(_manifest_dir(table_path), f"v{version}.json")
    ) as fh:
        m = json.load(fh)
    eq = m.get("eq_deletes")
    if not eq:
        return [], []
    return (
        [
            os.path.normpath(os.path.join(table_path, f))
            for f in eq["files"]
        ],
        list(eq["keys"]),
    )


def snapshot_delete_files(table_path: str, version: int) -> list[str]:
    """Deletion-vector sidecars registered by snapshot ``version``
    (empty for snapshots committed without row-level deletes)."""
    with open(os.path.join(_manifest_dir(table_path), f"v{version}.json")) as fh:
        m = json.load(fh)
    return [
        os.path.normpath(os.path.join(table_path, f))
        for f in m.get("deletes", [])
    ]


def file_key_col(table_path: str | None = None):
    """Stable per-row file identity for positional deletes.

    With ``table_path`` (the committed table root): the file's path
    RELATIVE to that root — matching how the manifest itself records
    files — so deletion-vector keys survive ANY rename/move of the
    table directory (readers always resolve keys against the root they
    are scanning, never against an absolute URI). Writers and readers
    of one table must use the same form; the DV plans pass the root.

    Without ``table_path`` (legacy): the last two path components
    (partition dir + part file). Unique within a table — part names
    embed task UUIDs — but for a FLAT table the 'partition dir' is the
    table directory's own name, so renaming the root silently orphans
    every DV key (the anti-join stops matching and deleted rows
    REAPPEAR rather than erroring). Kept only for pre-existing
    sidecars; new code should pass the root."""
    from pyspark.sql import functions as F

    if table_path is None:
        return F.substring_index(F.col("_metadata.file_path"), "/", -2)
    root = os.path.abspath(table_path).rstrip("/") + "/"
    # _metadata.file_path is a URI (file:///...); locate the absolute
    # root inside it and take everything after — scheme-independent
    return F.expr(
        "substring(_metadata.file_path,"
        f" instr(_metadata.file_path, '{root}') + {len(root)})"
    )


def read_snapshot_with_deletes(
    spark: SparkSession, table_path: str, version: int
) -> DataFrame:
    """Plan a scan over snapshot ``version`` with its deletion vectors
    APPLIED: each data row carries its physical position
    (``_metadata.row_index``) and file key; the DV sidecars hold the
    (file_key, pos) pairs a row-level DELETE/UPDATE logically removed,
    and a LEFT ANTI join masks them out. No data file is rewritten —
    the 100 TB point-delete shape: a MERGE touching 0.01% of rows
    commits kilobyte sidecars instead of rewriting terabytes. The anti
    join is left unhinted: DV size is commit-churn-sized, so AQE
    broadcasts the usual tiny case by stats and degrades to a shuffle
    join only when a commit really deleted a data-sized row set.
    Snapshots without DVs read exactly like :func:`read_snapshot`."""
    from pyspark.sql import functions as F

    files = snapshot_files(table_path, version)
    df = spark.read.option("basePath", table_path).parquet(*files)
    data_cols = df.columns
    dvs = snapshot_delete_files(table_path, version)
    if dvs:
        dv = spark.read.parquet(*dvs)  # (file_key string, pos long)
        df = (
            df.withColumn("_fk", file_key_col(table_path))
            .withColumn("_pos", F.col("_metadata.row_index"))
            .join(
                dv,
                on=[F.col("_fk") == dv.file_key, F.col("_pos") == dv.pos],
                how="left_anti",
            )
            .select(*data_cols)
        )
    eq_files, eq_keys = snapshot_equality_deletes(table_path, version)
    if eq_files:
        # equality deletes: anti-join on the KEY columns — merge-on-read
        # with no positions, so the delete writer never opened a data
        # file. Unhinted for the same AQE reason as the positional path.
        eq = spark.read.parquet(*eq_files).select(*eq_keys).dropDuplicates()
        df = df.join(eq, on=list(eq_keys), how="left_anti").select(
            *data_cols
        )
    return df


def versions(table_path: str) -> list[int]:
    mdir = _manifest_dir(table_path)
    if not os.path.isdir(mdir):
        return []
    out = []
    for f in os.listdir(mdir):
        if f.startswith("v") and f.endswith(".json"):
            out.append(int(f[1:-5]))
    return sorted(out)
