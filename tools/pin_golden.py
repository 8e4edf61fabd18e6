"""Capture golden outputs for the seeded/deterministic rows-only
queries so their oracle SQL can pin literal values (VERDICT r2 next #2).

Run: python tools/pin_golden.py > /tmp/golden.py
Prints a Python dict literal per query: {sf_key: [row tuples]} for the
embeddings-dependent ML queries (keyed by the DuckDB discriminator
``sum(vec_id*label)``), and a plain row list for the SF-independent
multimodal queries.
"""

from __future__ import annotations

import os
import pprint
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from bigdata_spark.session import get_spark

SFS = ("0.001", "0.01", "0.1")


def main() -> None:
    from bigdata_spark.plans.mlq import ml_dtw_distances, ml_global_tree, ml_local_forest
    from bigdata_spark.plans.multimodalq import mm_decode_features, mm_metadata

    spark = get_spark("pin_golden", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    per_sf = {"ml_global_tree": ml_global_tree, "ml_local_forest": ml_local_forest,
              "ml_dtw_distances": ml_dtw_distances}
    out: dict[str, object] = {}
    for name, fn in per_sf.items():
        by_key = {}
        for sf in SFS:
            sf_dir = f"/root/testdata/sf{sf}"
            key = duckdb.sql(
                f"SELECT CAST(sum(vec_id*label) AS BIGINT) FROM '{sf_dir}/embeddings.parquet'"
            ).fetchone()[0]
            rows = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
            by_key[int(key)] = rows
        out[name] = by_key

    for name, fn in (("mm_metadata", mm_metadata), ("mm_decode_features", mm_decode_features)):
        out[name] = sorted(tuple(r) for r in fn(spark, "/root/testdata/sf0.01").collect())

    print("GOLDEN = ", end="")
    pprint.pprint(out, width=100)


if __name__ == "__main__":
    main()
