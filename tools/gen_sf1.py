"""Generate an sf1 dataset (10x sf0.1) for the local scale soak
(VERDICT r3 next #7) by deterministic replication of the read-only
driver testdata at /root/testdata/sf0.1 — same schemas, referential
integrity preserved by shifting every key/FK by replica*stride.

Replicas are decorrelated where identity would distort the soak:
document text gets a per-replica vowel permutation (so near-dup
pipelines don't see every row as 10 exact copies and blow up
quadratically by construction), and embeddings get a small per-replica
deterministic perturbation (no exact duplicate vectors). Dimension
tables (region/nation) are copied as-is — they are fixed-size in TPC-H
at every scale factor.

Output: /root/repo/.localdata/sf1/*.parquet (gitignored).
Usage: python tools/gen_sf1.py [replicas]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".localdata", "sf1")


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT UNNEST(range({replicas})) AS r")

    def src(t: str) -> str:
        return f"'{SRC}/{t}.parquet'"

    def write(t: str, sql: str) -> None:
        out = f"{DST}/{t}.parquet"
        con.execute(f"COPY ({sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{t}: {n} rows")

    # fixed-size dims: verbatim
    write("region", f"SELECT * FROM {src('region')}")
    write("nation", f"SELECT * FROM {src('nation')}")

    # key strides (max+1 per table so shifted keys never collide)
    strides = {}
    for t, k in (
        ("customer", "c_custkey"), ("supplier", "s_suppkey"),
        ("part", "p_partkey"), ("orders", "o_orderkey"),
        ("events", "event_id"), ("documents", "doc_id"),
        ("embeddings", "vec_id"),
    ):
        strides[t] = con.sql(f"SELECT max({k}) + 1 FROM {src(t)}").fetchone()[0]
    user_stride = con.sql(f"SELECT max(user_id) + 1 FROM {src('events')}").fetchone()[0]

    write("customer", f"""
        SELECT c_custkey + r * {strides['customer']} AS c_custkey,
               -- re-derive the name from the SHIFTED key: names are an
               -- entity identity (er_blocked_linkage links on them), and
               -- replicating 10 rows per name silently turns the sf1
               -- roster into 10-way ambiguous entities
               'Customer#' || lpad(CAST(c_custkey + r * {strides['customer']} AS VARCHAR), 9, '0') AS c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {src('customer')} CROSS JOIN reps
    """)
    write("supplier", f"""
        SELECT s_suppkey + r * {strides['supplier']} AS s_suppkey,
               'Supplier#' || lpad(CAST(s_suppkey + r * {strides['supplier']} AS VARCHAR), 9, '0') AS s_name,
               s_nationkey, s_acctbal
        FROM {src('supplier')} CROSS JOIN reps
    """)
    write("part", f"""
        SELECT p_partkey + r * {strides['part']} AS p_partkey,
               p_name, p_brand, p_type, p_size, p_retailprice
        FROM {src('part')} CROSS JOIN reps
    """)
    write("orders", f"""
        SELECT o_orderkey + r * {strides['orders']} AS o_orderkey,
               o_custkey + r * {strides['customer']} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {src('orders')} CROSS JOIN reps
    """)
    write("lineitem", f"""
        SELECT l_orderkey + r * {strides['orders']} AS l_orderkey,
               l_partkey + r * {strides['part']} AS l_partkey,
               l_suppkey + r * {strides['supplier']} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {src('lineitem')} CROSS JOIN reps
    """)
    write("events", f"""
        SELECT event_id + r * {strides['events']} AS event_id,
               ts,
               user_id + r * {user_stride} AS user_id,
               event_type, value, props
        FROM {src('events')} CROSS JOIN reps
    """)
    # per-replica vowel rotation decorrelates shingle sets between
    # replicas while preserving length/charset statistics
    vowels = "aeiou"
    rots = {r: vowels[r % 5:] + vowels[: r % 5] for r in range(replicas)}
    cases = " ".join(
        f"WHEN r = {r} THEN translate(text, '{vowels}', '{rot}')"
        for r, rot in rots.items()
    )
    write("documents", f"""
        SELECT doc_id + r * {strides['documents']} AS doc_id,
               CASE {cases} END AS text,
               lang, source,
               n_chars
        FROM {src('documents')} CROSS JOIN reps
    """)
    # deterministic per-(vector, replica) perturbation: breaks exact
    # duplicates, keeps the geometry (|delta| <= 0.005)
    write("embeddings", f"""
        SELECT vec_id + r * {strides['embeddings']} AS vec_id,
               CAST(list_transform(embedding,
                    x -> x + ((hash(vec_id * {replicas} + r) % 1000) / 1000.0 - 0.5) * 0.01)
                    AS FLOAT[]) AS embedding,
               label
        FROM {src('embeddings')} CROSS JOIN reps
    """)
    print(f"wrote {DST}")


if __name__ == "__main__":
    main()
