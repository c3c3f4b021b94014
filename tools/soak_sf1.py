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

    # winnowing at sf1 (round-5 verdict item #3 evidence): the 50k-doc
    # table has heavy replica structure — the exact corpus shape that
    # blows up the all-pairs bucket join. Chain+salt must keep pair
    # volume linear-ish in doc count, not quadratic in bucket size.
    from sophox_spark.operators import dedup

    docs = spark.read.parquet(f"{SF1_DIR}/documents.parquet")
    t0 = time.perf_counter()
    n_pairs = dedup.winnow_candidates(
        docs, mode="chain", chain_salt=8
    ).count()
    dt = time.perf_counter() - t0
    out["queries"]["winnow_chain_salted"] = {
        "rows": n_pairs, "sec": round(dt, 2),
        "docs": docs.count(),
    }
    print(f"winnow_chain_salted: {n_pairs} pairs in {dt:.1f}s",
          file=sys.stderr)

    # media decode at sf1 (round-5 verdict item #4): the mapInPandas
    # JPEG path had only run at bench fixture sizes. 512 baseline
    # 160x120 RGB JPEGs encoded executor-side, decoded through the
    # from-scratch codec, reduced to pixel stats.
    from pyspark.sql import functions as F

    ids = spark.range(512).withColumnRenamed("id", "media_id") \
        .repartition(32)

    def gen(batches):
        import numpy as np
        import pandas as pd

        from sophox_spark.functions import jpeg as _jpeg

        for pdf in batches:
            payloads = []
            for i in pdf["media_id"]:
                i = int(i)
                w, h = 160, 120
                v = (
                    (3 + i % 4) * np.arange(w)[None, :, None]
                    + (5 + i % 3) * np.arange(h)[:, None, None]
                    + 7 * np.arange(3)[None, None, :]
                    + i
                ) % 256
                payloads.append(
                    _jpeg.encode(v.astype(np.uint8), "420")
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads}
            )

    from sophox_spark.operators import multimodal

    media = ids.mapInPandas(gen, "media_id long, payload binary")
    t0 = time.perf_counter()
    row = multimodal.decode_images(media).agg(
        F.count("*").alias("n"),
        F.sum(F.col("width") * F.col("height") * F.col("channels"))
        .alias("px_bytes"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    out["queries"]["jpeg_decode_512"] = {
        "rows": int(row["n"]), "sec": round(dt, 2),
        "decoded_mb_per_sec": round(row["px_bytes"] / (1 << 20) / dt, 1),
    }
    print(f"jpeg_decode_512: {row['n']} images in {dt:.1f}s "
          f"({out['queries']['jpeg_decode_512']['decoded_mb_per_sec']} "
          f"decoded MB/s)", file=sys.stderr)

    # corpus-hygiene stages at sf1 (round 6): line dedup and 13-gram
    # decontamination over the full 50k-doc table — the hash-keyed
    # count/semi-join shapes whose scale story the small-SF oracles
    # can't exercise. The replica suffixes make most lines corpus-wide
    # duplicates, the worst case for the repeated-line table.
    t0 = time.perf_counter()
    ld = dedup.line_dedup(docs).agg(
        F.count("*").alias("n"),
        F.sum("n_dropped").alias("dropped"),
    ).collect()[0]
    dt = time.perf_counter() - t0
    out["queries"]["line_dedup"] = {
        "rows": int(ld["n"]), "sec": round(dt, 2),
        "lines_dropped": int(ld["dropped"]),
    }
    print(f"line_dedup: {ld['n']} docs in {dt:.1f}s "
          f"({ld['dropped']} lines dropped)", file=sys.stderr)

    bench = docs.where("doc_id % 5000 = 7").select("text")
    t0 = time.perf_counter()
    n_flagged = dedup.decontaminate(docs, bench, n=13).count()
    dt = time.perf_counter() - t0
    out["queries"]["decontaminate_13gram"] = {
        "rows": n_flagged, "sec": round(dt, 2),
    }
    print(f"decontaminate_13gram: {n_flagged} docs flagged in {dt:.1f}s",
          file=sys.stderr)

    # exact-substring dedup at sf1 (round 6, third pass): the k=13
    # window explode is the newest k-times row blowup in the repo; the
    # replica corpus makes nearly EVERY window corpus-wide duplicated —
    # worst case for both the hot-hash semi-join and the span merge.
    t0 = time.perf_counter()
    n_spans = dedup.duplicated_spans(docs, k=13).count()
    dt = time.perf_counter() - t0
    out["queries"]["substr_spans"] = {"rows": n_spans, "sec": round(dt, 2)}
    print(f"substr_spans: {n_spans} spans in {dt:.1f}s", file=sys.stderr)

    t0 = time.perf_counter()
    st = dedup.strip_duplicated_spans(docs, k=13).agg(
        F.count("*").alias("n"), F.sum("n_removed").alias("removed")
    ).collect()[0]
    dt = time.perf_counter() - t0
    out["queries"]["substr_strip"] = {
        "rows": int(st["n"]), "sec": round(dt, 2),
        "tokens_removed": int(st["removed"]),
    }
    print(f"substr_strip: {st['n']} docs in {dt:.1f}s "
          f"({st['removed']} tokens removed)", file=sys.stderr)

    # bigram-LM perplexity at sf1: train on the 10% shard, score the
    # rest — the broadcast count-table join shape at 45k scored docs.
    from sophox_spark.functions import lm

    t0 = time.perf_counter()
    model = lm.train_bigram_lm(docs.where("doc_id % 10 = 0"))
    n_scored = lm.perplexity(docs.where("doc_id % 10 <> 0"), model).count()
    dt = time.perf_counter() - t0
    out["queries"]["lm_perplexity"] = {"rows": n_scored, "sec": round(dt, 2)}
    print(f"lm_perplexity: {n_scored} docs in {dt:.1f}s", file=sys.stderr)

    out["jvm_peak_rss_mb"] = jvm_peak_rss_mb()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
