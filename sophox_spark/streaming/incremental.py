"""Incremental ingestion: micro-batch MERGE with the reference's
streaming semantics (SURVEY §2.8 ST1-ST8).

The reference's update loop polls minute diffs, dedups within a batch
(flushes early on a duplicate subject, RdfUpdateHandler.py:27-31),
upserts by delete-then-insert per subject (idempotent, :42-57), and
persists the high-watermark seqid transactionally with the data
(:59-66). Spark-native re-expression:

  ST5 in-batch dedup    → row_number() over (key ORDER BY version/seq DESC) = 1
  ST4 idempotent upsert → MERGE emulation: base LEFT-ANTI batch ∪ batch
  ST1/ST3 offsets       → manifest.last_seqid(); replay-safe skip
  ST2 watermark         → manifest row (seqid, max event ts, row count)
  snapshot atomicity    → versioned table dirs {path}/v=N; readers pick
                          the latest manifest-recorded version (no
                          Iceberg jars in this container — this is the
                          snapshot-commit emulation, documented).
                          PartitionedSnapshotTable adds DELTA commits:
                          hash-bucketed layout where a batch rewrites
                          only buckets containing its keys — O(touched)
                          per micro-batch, not O(table)

The fixpoint derived-view job (ST7, relation centroids with rel→rel
chains and cycles, updateRelLoc.py:62-88,159-161) lives here too.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..manifest import Manifest
from ..operators.osm_geometry import relation_member_locations


def dedup_latest(batch_df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """ST5/ST8: keep only the newest row per key within a batch (the
    osmosis --simplify-change analog)."""
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_by])
    return (
        batch_df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def merge_upsert(
    base_df: DataFrame,
    batch_df: DataFrame,
    keys: list[str],
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO emulation (J9): delete-then-insert per key.
    Rows of ``batch_df`` replace base rows with the same key; rows
    flagged by ``delete_col`` are removed entirely. Idempotent: applying
    the same batch twice yields the identical table."""
    kept = base_df.join(batch_df.select(*keys).distinct(), keys, "left_anti")
    inserts = batch_df
    if delete_col is not None:
        inserts = inserts.filter(~F.col(delete_col)).drop(delete_col)
    return kept.unionByName(inserts.select(*base_df.columns))


class PartitionedSnapshotTable:
    """Hash-bucketed versioned parquet table with DELTA commits.

    A change batch rewrites only the buckets containing its keys —
    untouched buckets' files are never re-written (their bytes stay
    identical across commits), so per-batch work is O(touched buckets),
    not O(table). This is the no-Iceberg emulation of partition-level
    MERGE, matching the reference's touch-only-changed-subjects update
    loop (RdfUpdateHandler.py:42-57) at table-file granularity.

    Layout: ``{path}/v={N}/__bucket={b}/…`` — version N's directory
    holds files ONLY for the buckets it touched. The manifest unit
    string encodes the touched set (``v3@0,5,12``), so the current
    snapshot (per-bucket latest version) is reconstructible from the
    manifest alone; a data write without its manifest row is invisible
    (write data → write manifest, same protocol as Manifest docstring).

    SNAPSHOT COMPACTION: every ``compact_every`` delta commits the
    commit also writes a snapshot unit (``snap5@0:3,1:5,…`` — the full
    bucket→version map as of that version), so ``bucket_versions()``
    collects only the latest snapshot row plus the ≤ compact_every
    delta rows after it — read cost stays O(compact_every), it does
    NOT grow with commit history. Bucket-directory existence probes go
    through the Hadoop FileSystem API (sophox_spark/fs.py), so the same
    code path serves file://, hdfs:// and s3a:// table locations.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        manifest: Manifest,
        name: str,
        keys: tuple[str, ...] = ("id",),
        n_buckets: int = 16,
        compact_every: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.manifest = manifest
        self.name = name
        self.keys = list(keys)
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        # single-writer cache of (bucket→version, current version):
        # commits update it in place, so a commit loop reads the
        # manifest once when cold instead of once per commit. Another
        # handle on the same path sees new commits after refresh().
        self._bv_cache: dict[int, int] | None = None
        self._cv_cache: int | None = None

    def refresh(self) -> None:
        """Drop the cached snapshot state (re-read manifest on next use)."""
        self._bv_cache = None
        self._cv_cache = None

    def _bucket_col(self):
        return F.pmod(F.xxhash64(*self.keys), F.lit(self.n_buckets)).cast("int")

    def _read_units(self) -> list[str]:
        """Manifest units needed to reconstruct the snapshot: the latest
        ``snap`` row + every delta row past it. Filtering happens in
        Spark; the driver collects a BOUNDED set (≤ compact_every + 1
        rows), never the full commit history."""
        units = self.manifest.units_df(f"table:{self.name}")
        if units is None:
            return []
        ver = F.regexp_extract("unit", r"^(?:snap|v)([0-9]+)@", 1).cast("long")
        is_snap = F.col("unit").startswith("snap")
        tagged = units.select("unit", ver.alias("v"), is_snap.alias("s"))
        last_snap = tagged.filter("s").agg(F.max("v")).collect()[0][0]
        if last_snap is None:
            return [r.unit for r in tagged.select("unit").collect()]
        rows = tagged.filter(
            (F.col("s") & (F.col("v") == last_snap))
            | (~F.col("s") & (F.col("v") > last_snap))
        )
        return [r.unit for r in rows.select("unit").distinct().collect()]

    def bucket_versions(self) -> dict[int, int]:
        """bucket → latest version that rewrote it (from the manifest;
        cached between commits of this writer handle)."""
        if self._bv_cache is not None:
            return dict(self._bv_cache)
        mapping: dict[int, int] = {}
        deltas: list[tuple[int, str]] = []
        for u in self._read_units():
            v_str, _, b_str = u.partition("@")
            if v_str.startswith("snap"):
                for pair in b_str.split(","):
                    if pair:
                        b, _, v = pair.partition(":")
                        mapping[int(b)] = int(v)
            else:
                deltas.append((int(v_str[1:]), b_str))
        max_v = None
        for v, b_str in sorted(deltas):
            max_v = v if max_v is None else max(max_v, v)
            for b in b_str.split(","):
                if b:
                    bi = int(b)
                    mapping[bi] = max(mapping.get(bi, -1), v)
        if mapping:
            max_v = max(max_v or -1, max(mapping.values()))
        self._bv_cache = dict(mapping)
        self._cv_cache = max_v
        return mapping

    def current_version(self) -> int | None:
        if self._bv_cache is None:
            self.bucket_versions()  # fills both caches
        return self._cv_cache

    def _read_buckets(self, buckets) -> DataFrame | None:
        from .. import fs

        m = self.bucket_versions()
        # a touched bucket whose merged content is empty writes no dir
        # (partitionBy emits only present values) — that's a valid empty
        # bucket, not a missing file. Existence probes go through the
        # Hadoop FS API so cluster schemes (hdfs://, s3a://) work.
        paths = [
            p
            for b, v in m.items()
            if (buckets is None or b in buckets)
            and fs.is_dir(self.spark, p := f"{self.path}/v={v}/__bucket={b}")
        ]
        if not paths:
            return None
        return self.spark.read.parquet(*paths)

    def read(self) -> DataFrame | None:
        return self._read_buckets(None)

    def commit_batch(
        self,
        batch_df: DataFrame,
        seqid: int,
        watermark=None,
        delete_col: str | None = None,
    ) -> int:
        """Delta commit: MERGE ``batch_df`` into only the buckets its
        keys hash to. Returns the new version number."""
        v = (self.current_version() or 0) + 1
        batch = batch_df.withColumn("__bucket", self._bucket_col())
        touched = sorted(
            r[0] for r in batch.select("__bucket").distinct().collect()
        )
        if not touched:
            self.manifest.record(f"table:{self.name}", f"v{v}@", seqid, watermark, 0)
            self._cv_cache = v
            return v
        base = self._read_buckets(set(touched))
        if base is None:
            merged = batch
            if delete_col is not None:
                merged = merged.filter(~F.col(delete_col)).drop(delete_col)
        else:
            base = base.withColumn("__bucket", self._bucket_col())
            merged = merge_upsert(base, batch, self.keys, delete_col=delete_col)
        out_dir = f"{self.path}/v={v}"
        merged.write.partitionBy("__bucket").mode("errorifexists").parquet(out_dir)
        try:
            n = self.spark.read.parquet(out_dir).count()  # O(touched buckets)
        except Exception:
            n = 0  # merged content entirely empty (all rows deleted)
        unit = f"v{v}@{','.join(map(str, touched))}"
        self.manifest.record(f"table:{self.name}", unit, seqid, watermark, n)
        if self._bv_cache is not None:
            for b in touched:
                self._bv_cache[b] = v
        self._cv_cache = v
        if self.compact_every and v % self.compact_every == 0:
            # periodic snapshot row: full bucket→version map, so future
            # reads never walk further back than this commit
            m = self.bucket_versions()
            snap = f"snap{v}@" + ",".join(
                f"{b}:{ver}" for b, ver in sorted(m.items())
            )
            self.manifest.record(f"table:{self.name}", snap, seqid, watermark, n)
        return v


class SnapshotTable:
    """Versioned parquet table with manifest-committed snapshots."""

    def __init__(self, spark: SparkSession, path: str, manifest: Manifest, name: str):
        self.spark = spark
        self.path = path
        self.manifest = manifest
        self.name = name

    def current_version(self) -> int | None:
        units = self.manifest.completed_units(f"table:{self.name}")
        versions = [int(u[1:]) for u in units if u.startswith("v")]
        return max(versions) if versions else None

    def read(self) -> DataFrame | None:
        v = self.current_version()
        if v is None:
            return None
        return self.spark.read.parquet(f"{self.path}/v={v}")

    def commit(self, df: DataFrame, seqid: int, watermark=None) -> int:
        v = (self.current_version() or 0) + 1
        df.write.mode("overwrite").parquet(f"{self.path}/v={v}")
        n = self.spark.read.parquet(f"{self.path}/v={v}").count()
        self.manifest.record(f"table:{self.name}", f"v{v}", seqid, watermark, n)
        return v


def apply_change_batches(
    spark: SparkSession,
    table: SnapshotTable,
    changes_df: DataFrame,
    keys: list[str] = ("id",),
    seq_col: str = "seqid",
    ts_col: str = "ts",
    version_cols: list[str] | None = None,
) -> dict:
    """Consume a change stream batch-by-batch with ST1-ST5 semantics.

    Batches with ``seqid <= last applied`` are skipped (at-least-once
    replay, no-op by idempotence). Returns per-batch apply/skip stats —
    the A5 counter analog."""
    keys = list(keys)
    version_cols = version_cols or ["version", ts_col]
    last = table.manifest.last_seqid(f"table:{table.name}") or -1
    seqids = [
        r[0]
        for r in changes_df.select(seq_col).distinct().orderBy(seq_col).collect()
    ]
    stats = {"applied": [], "skipped": []}
    for seq in seqids:
        if seq <= last:
            stats["skipped"].append(seq)
            continue
        batch = changes_df.filter(F.col(seq_col) == seq)
        batch = dedup_latest(batch, keys, version_cols)
        upserts = batch.withColumn("__del", F.col("op") == "delete")
        wm = batch.agg(F.max(ts_col)).collect()[0][0]
        if isinstance(table, PartitionedSnapshotTable):
            # delta path: only buckets holding this batch's keys rewrite
            table.commit_batch(
                upserts.drop(seq_col, "op"), seq, wm, delete_col="__del"
            )
        else:
            base = table.read()
            if base is None:
                merged = upserts.filter(~F.col("__del")).drop("__del", seq_col, "op")
            else:
                merged = merge_upsert(
                    base,
                    upserts.drop(seq_col, "op"),
                    keys,
                    delete_col="__del",
                )
            table.commit(merged, seq, wm)
        last = seq
        stats["applied"].append(seq)
    return stats


def relation_centroids_fixpoint(
    nodes_df: DataFrame,
    way_locs_df: DataFrame,
    relations_df: DataFrame,
    max_iters: int = 25,
) -> DataFrame:
    """ST7: derived-view fixpoint. A relation's location is the centroid
    (arithmetic mean — MultiPoint centroid, updateRelLoc.py:129-130) of
    its members' locations; relations referencing unresolved relations
    wait for a later pass. Iterate while progress is made (the
    reference's shrinking-skipped-list loop, updateRelLoc.py:76-87);
    cycles never resolve and are left out — termination by no-progress,
    exactly as the reference.

    Returns (rel_id, lon, lat, n_members, iteration) — ``iteration``
    stamps the pass each relation RESOLVED in (its dependency depth,
    matching the reference's shrinking-skipped-list semantics)."""
    spark = nodes_df.sparkSession
    resolved = spark.createDataFrame(
        [], "rel_id long, lon double, lat double, n_members long, iteration int"
    )
    node_locs = nodes_df.select("id", "lon", "lat").filter(
        F.col("lon").isNotNull() & ~F.isnan("lon") & F.col("lat").isNotNull() & ~F.isnan("lat")
    )
    # SHRINKING WORKLIST (updateRelLoc.py:76-87 keeps only the skipped
    # rels for the next pass): each pass re-evaluates ONLY the still-
    # unresolved relations — pass k touches the depth-≥k tail, not the
    # whole table. Resolved rows accumulate; their centroids are final
    # the pass they resolve (member snapshots only ever gain rows).
    pending = relations_df.localCheckpoint(eager=True)
    for it in range(1, max_iters + 1):
        member_locs = relation_member_locations(
            pending,
            node_locs,
            way_locs_df.filter(~F.col("loc_error")),
            rel_locs=resolved.select("rel_id", "lon", "lat"),
        )
        # a relation resolves when EVERY member has a location
        agg = member_locs.groupBy("rel_id").agg(
            F.count("*").alias("n_members"),
            F.sum(F.when(F.col("lon").isNull(), 1).otherwise(0)).alias("n_missing"),
            F.avg("lon").alias("lon"),
            F.avg("lat").alias("lat"),
        )
        new_resolved = (
            agg.filter(F.col("n_missing") == 0)
            .select("rel_id", "lon", "lat", "n_members")
            .withColumn("iteration", F.lit(it))
            # checkpoint FIRST, count the checkpointed result: one
            # materialization per iteration, not two
            .localCheckpoint(eager=True)
        )
        if not new_resolved.head(1):
            break
        resolved = resolved.unionByName(new_resolved)
        pending = pending.join(
            new_resolved.select("rel_id").withColumnRenamed("rel_id", "id"),
            "id",
            "left_anti",
        ).localCheckpoint(eager=True)
        if not pending.head(1):
            break
    return resolved
