"""Round-7 auxiliary benchmark (bench.py is frozen for measurement).

Times EVERY queries() entry at $SPARK_GRAFT_SF_DIR (default sf0.1) with
the noop sink (guide §1.4 — full-column materialization, no sink cost,
no count-prune) and labeled jobs. Prints one JSON line:
  {"queries": {name: sec, ...}, "sf": ..., "cpus": N}

Used to locate hot NON-headline operators and to document before/after
evidence in OPTIMIZATION_r07.md; the official sweep stays bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod
from sophox_spark.plans import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    only = set(sys.argv[1:])
    spark = get_spark("bench_extra", cpus=CPUS, shuffle_partitions=CPUS)
    qs = entry_mod.queries()
    spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        try:
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # noqa: BLE001 - survey harness
            timings[name] = -1.0
            print(f"# {name} FAILED: {ex}", file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": CPUS,
    }))


if __name__ == "__main__":
    main()
