"""Quiet-host control probe (VERDICT r10 item 7): pin a host-speed
yardstick NEXT TO the bench pin so future pin-vs-pin comparisons can
normalize out host drift (the r9 methodology: driver-run totals are
host-sensitive; only a same-file control makes two pins comparable).

Runs a tiny fixed workload N times on the SAME sf as the bench —
one scan-agg (pricing_summary) and one join (lineitem_part_report) —
and records min/median wall-clock. Run it IMMEDIATELY after bench.py
on an otherwise-idle box, then merge into the pinned detail file:

    python tools/host_control.py BENCH_DETAIL_r11.json
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from rearc_data_engineer_takehome_spark.queries import (  # noqa: E402
    REGISTRY,
)
from rearc_data_engineer_takehome_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("HOST_CONTROL_RUNS", "10"))
PROBES = ("pricing_summary", "lineitem_part_report")


def main() -> None:
    target = sys.argv[1] if len(sys.argv) > 1 else None
    spark = get_spark(
        shuffle_partitions=int(
            os.environ.get("SPARK_GRAFT_CPUS", "32")
        )
    )
    control: dict = {"runs": RUNS, "sf_dir": SF_DIR, "probes": {}}
    for name in PROBES:
        q = REGISTRY[name].spark
        q(spark, SF_DIR).count()  # warm (codegen + file listing)
        times = []
        for _ in range(RUNS):
            t0 = time.perf_counter()
            q(spark, SF_DIR).count()
            times.append(round(time.perf_counter() - t0, 4))
        control["probes"][name] = {
            "min": min(times),
            "median": round(statistics.median(times), 4),
            "all": times,
        }
    print(json.dumps(control))
    if target:
        d = json.load(open(target))
        d["host_control"] = control
        json.dump(d, open(target, "w"), indent=1, sort_keys=True)
        print(f"merged host_control into {target}")


if __name__ == "__main__":
    main()
