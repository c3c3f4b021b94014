"""sf1-scale soak of the flagship paths (round-5 verdict item #6).

Generates a deterministic sf1 dataset (10x sf0.1: events 1M rows by
id-shifted replication, documents 50k with per-replica text suffixes so
near-dup structure stays bounded) under /tmp/sophox_sf1, then runs
q_pip_engine / q_regions_clipped / q_dedup_clusters once each and
reports wall time, row count, and the JVM's peak RSS (VmHWM) — the
memory-cliff probe the small-SF parity runs can't provide.

Usage: python tools/soak_sf1.py [--regen]
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF1_DIR = "/tmp/sophox_sf1"


def generate():
    import duckdb

    os.makedirs(SF1_DIR, exist_ok=True)
    src = "/root/testdata/sf0.1"
    con = duckdb.connect()
    con.execute(f"""
COPY (
  SELECT event_id + k * 100000 AS event_id,
         ts + INTERVAL (k) HOUR AS ts,
         user_id + k * 1000 AS user_id, event_type, value, props
  FROM read_parquet('{src}/events.parquet'), range(10) t(k)
) TO '{SF1_DIR}/events.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
COPY (
  SELECT doc_id + k * 5000 AS doc_id,
         text || ' replica' || CAST(k AS VARCHAR) AS text,
         lang, source, n_chars + 9 AS n_chars
  FROM read_parquet('{src}/documents.parquet'), range(10) t(k)
) TO '{SF1_DIR}/documents.parquet' (FORMAT PARQUET)""")
    # remaining tables: straight copies (not used by the soak queries,
    # present so _load of any extra table still works)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        con.execute(f"""
COPY (SELECT * FROM read_parquet('{src}/{t}.parquet'))
TO '{SF1_DIR}/{t}.parquet' (FORMAT PARQUET)""")
    con.close()


def jvm_peak_rss_mb():
    best = 0
    for status in glob.glob("/proc/[0-9]*/status"):
        try:
            with open(status) as f:
                txt = f.read()
        except OSError:
            continue
        if "\nName:\tjava\n" not in "\n" + txt:
            continue
        for line in txt.splitlines():
            if line.startswith("VmHWM:"):
                best = max(best, int(line.split()[1]) // 1024)
    return best


def main():
    if "--regen" in sys.argv or not os.path.exists(
        f"{SF1_DIR}/documents.parquet"
    ):
        t0 = time.perf_counter()
        generate()
        print(f"generated sf1 in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)

    import __spark_entry__ as m
    from sophox_spark.plans import get_spark

    spark = get_spark("soak_sf1", cpus=32, shuffle_partitions=64)
    qs = m.queries()
    out = {"sf_dir": SF1_DIR, "queries": {}}
    for name in ("q_pip_engine", "q_regions_clipped", "q_dedup_clusters"):
        t0 = time.perf_counter()
        n = qs[name](spark, SF1_DIR).count()
        dt = time.perf_counter() - t0
        out["queries"][name] = {"rows": n, "sec": round(dt, 2)}
        print(f"{name}: {n} rows in {dt:.1f}s", file=sys.stderr)
    out["jvm_peak_rss_mb"] = jvm_peak_rss_mb()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
