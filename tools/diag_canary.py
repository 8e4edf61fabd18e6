"""Diagnose in-sequence bench inflation: run the registry in bench
order and re-time a fast canary query every N queries. If the canary's
time grows with position, accumulated session state is the cause, and
the growth points at which stretch of queries poisons the session.

Usage: python tools/diag_canary.py [start_idx end_idx]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANARY = "sql_api_q1"
EVERY = 10


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from bigdata_spark.plans import all_queries
    from bigdata_spark.session import get_spark

    spark = get_spark(
        "diag_canary",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.cleaner.periodicGC.interval": "1min",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    names = list(registry)
    lo = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    hi = int(sys.argv[2]) if len(sys.argv) > 2 else len(names)

    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    def run(name: str) -> float:
        fn, _ = registry[name]
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # canary baseline: warm it twice
    run(CANARY)
    base = run(CANARY)
    print(json.dumps({"canary_baseline": base}), flush=True)

    canary_track = [(0, base)]
    for i, name in enumerate(names[lo:hi], start=lo):
        if name == CANARY:
            continue
        t = run(name)
        print(json.dumps({"i": i, "q": name, "t": t}), flush=True)
        if (i + 1) % EVERY == 0:
            c = run(CANARY)
            canary_track.append((i + 1, c))
            print(json.dumps({"canary_at": i + 1, "t": c}), flush=True)

    c = run(CANARY)
    canary_track.append((hi, c))
    print(json.dumps({"canary_final": c, "track": canary_track}), flush=True)


if __name__ == "__main__":
    main()
