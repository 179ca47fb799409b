"""Per-query profile: wall seconds + Spark job/stage/task counts.

Optimization-round instrument (guide §1): many registry queries are
iterative or multi-pass, so their sf0.1 cost is dominated by the NUMBER
of sequential job barriers (driver round-trips), not data volume. This
tool times each named query with the same ``.count()`` action bench.py
uses and reports how many jobs/stages/tasks the action scheduled, via
an attached SparkListener (accurate regardless of job groups).

Usage:
    python tools/query_profile.py q1 q2 ...      # profile named queries
    python tools/query_profile.py --top N        # N slowest from BENCH_DETAIL.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rearc_data_engineer_takehome_spark.queries import REGISTRY  # noqa: E402
from rearc_data_engineer_takehome_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    if args and args[0] == "--top":
        n = int(args[1]) if len(args) > 1 else 20
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        detail = json.load(open(os.path.join(root, "BENCH_DETAIL.json")))
        names = [
            k
            for k, _ in sorted(detail["queries"].items(), key=lambda kv: -kv[1])[:n]
        ]
    else:
        names = args
    spark = get_spark(
        app_name="query_profile",
        master=f"local[{CPUS}]",
        shuffle_partitions=int(CPUS),
    )
    spark.sparkContext.setLogLevel("WARN")
    sc = spark.sparkContext

    # job/stage/task counting via the AppStatusStore REST-backing store:
    # read cumulative counts before/after each run
    def counts():
        store = sc._jsc.sc().statusStore()
        jobs = store.jobsList(None)
        n_jobs = jobs.size()
        n_stages = 0
        n_tasks = 0
        it = jobs.iterator()
        while it.hasNext():
            j = it.next()
            n_stages += j.stageIds().size()
            n_tasks += j.numTasks()
        return n_jobs, n_stages, n_tasks

    # warm like bench.py so first-touch JIT doesn't pollute
    for warm in ("pricing_summary", "doc_fingerprints"):
        if warm in REGISTRY:
            REGISTRY[warm].spark(spark, SF_DIR).count()

    jsc = sc._jsc
    protected = set(jsc.getPersistentRDDs().keys())

    def free_blocks() -> None:
        for rid, rdd in jsc.getPersistentRDDs().items():
            if rid not in protected:
                rdd.unpersist()

    rows = []
    for name in names:
        if name not in REGISTRY:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        q = REGISTRY[name]
        best = None
        for _ in range(2):
            j0, s0, t0c = counts()
            t0 = time.perf_counter()
            q.spark(spark, SF_DIR).count()
            dt = time.perf_counter() - t0
            j1, s1, t1c = counts()
            rec = {
                "query": name,
                "sec": round(dt, 3),
                "jobs": j1 - j0,
                "stages": s1 - s0,
                "tasks": t1c - t0c,
            }
            if best is None or rec["sec"] < best["sec"]:
                best = rec
            free_blocks()
        rows.append(best)
        print(
            f"{best['sec']:>8.3f}s  jobs={best['jobs']:<4} stages={best['stages']:<5} "
            f"tasks={best['tasks']:<6} {name}",
            flush=True,
        )
    print(json.dumps(rows))
    spark.stop()


if __name__ == "__main__":
    main()
