"""Distributed point-in-polygon spatial join (filter → refine).

The engine's flagship operator (SURVEY §2.3 J7/J8). The reference
answers polygon-membership with a single-node PostGIS nested-loop over a
GiST index (/root/reference/osm-regions-server/osm-regions/
wd_only_sql.js:23-28); ours decomposes into Spark-native pieces that
scale horizontally:

  1. COVER  (dim-side, once): polygons → ``polygon_cells(cell,
     polygon_id, fully_contained)`` at a chosen grid res, range-
     partitioned by cell — the north_rule's "polygon sides
     range-partitioned by cell prefix".
  2. FILTER (fact-side): points get a cell id from a NATIVE expression
     (whole-stage codegen) and equi-join ``polygon_cells`` on ``cell`` — a plain
     Catalyst hash join; the dim side is broadcast when small. Skewed
     cells are AQE-split (spark.sql.adaptive.skewJoin) and, for the
     pathological city-cell case, the dim is salted (``salt`` arg):
     polygon_cells rows replicate ``salt`` ways, points pick one salt
     lane — a two-phase shuffle that caps any single task's pair count.
  3. ACCEPT/REFINE: pairs in ``fully_contained`` cells are inside by
     construction (no Python at all — most of the area of big admin
     polygons); boundary-cell pairs are ray-cast exactly in one Arrow
     batch pass. With ``broadcast_dim`` the polygon WKB is a broadcast
     map; on the shuffle path (dim too large to collect) each BOUNDARY
     pair instead carries its polygon WKB through a co-partitioned left
     join — fully distributed, no driver collect anywhere.

At 100 TB the only shuffles are the fact-side hash on ``cell`` (none at
all when the dim broadcasts) plus, on the shuffle path, the boundary-
pair ⋈ polygon-geometry hash on ``polygon_id``; refinement cost is
proportional to *boundary* candidate pairs only.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..cells import grid
from ..geometry import cover, wkb
from ..geometry.pip import PreparedPolygons

DEFAULT_RES = 13  # ≈ 2.4 km cells (H3 res-7 analog, grid.H3_ANALOG_RES)

# a polygon's WKB must exceed this (~8k vertices) before the
# seed-parallel covering's reshuffle beats one-task-local recursion
_SEED_PARALLEL_MIN_BYTES = 128 << 10


def cell_expr(lon_col: str, lat_col: str, res: int):
    """NATIVE column expression for grid.encode — identical IEEE double
    arithmetic to the numpy kernel (same ops in the same order), but
    whole-stage-codegen'd JVM-side: the hot path ships no rows to
    Python. Invalid coords → -1 (loc:error semantics)."""
    n = float(1 << res)
    n_max = (1 << res) - 1
    lon, lat = F.col(lon_col), F.col(lat_col)
    x = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(n_max).cast("long"), F.floor((lon + 180.0) / 360.0 * n).cast("long")),
    )
    y = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.lit(n_max).cast("long"), F.floor((lat + 90.0) / 180.0 * n).cast("long")),
    )
    cell = F.lit(res).cast("long") * F.lit(1 << 58) + x * F.lit(1 << 29) + y
    bad = (
        lon.isNull() | lat.isNull() | F.isnan(lon) | F.isnan(lat)
        | (lon < -180.0) | (lon > 180.0) | (lat < -90.0) | (lat > 90.0)
    )
    return F.when(bad, F.lit(-1).cast("long")).otherwise(cell)


def cell_col(lon_col: str, lat_col: str, res: int):
    """Arrow-batched variant of ``cell_expr`` running the shared numpy
    kernel — kept for cross-validation (the q_geo_cells driver check
    pins numpy == SQL semantics; tests pin numpy == native expr)."""

    @F.pandas_udf("long")
    def _enc(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(grid.encode(lon.to_numpy(), lat.to_numpy(), res))

    return _enc(F.col(lon_col), F.col(lat_col))


def build_polygon_cells(
    polygons_df: DataFrame,
    res: int = DEFAULT_RES,
    geom_col: str = "geom",
    id_col: str = "polygon_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """Polygon dim → cell covering table, range-partitioned by cell so a
    later non-broadcast join on ``cell`` is co-partitioned and file
    skipping works on cell ranges when persisted."""
    out_schema = f"cell long, {id_col} long, fully_contained boolean"

    def gen(batches):
        for pdf in batches:
            packed = wkb.pack(pdf[geom_col].tolist())
            poly_idx, cells, full = cover.cover_polygons(packed, res)
            yield pd.DataFrame(
                {
                    "cell": cells,
                    id_col: pdf[id_col].to_numpy()[poly_idx],
                    "fully_contained": full,
                }
            )

    # spread the covering work: one polygon row is cheap to ship, its
    # covering fan-out is not — parallelize across cores
    spark = polygons_df.sparkSession
    n_slices = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cells_df = (
        polygons_df.select(id_col, geom_col)
        .repartition(n_slices)
        .mapInPandas(gen, out_schema)
    )
    if num_partitions:
        cells_df = cells_df.repartitionByRange(num_partitions, "cell")
    return cells_df


def build_polygon_cells_adaptive(
    polygons_df: DataFrame,
    res_min: int = 9,
    res_max: int = DEFAULT_RES,
    geom_col: str = "geom",
    id_col: str = "polygon_id",
    num_partitions: int | None = None,
    seed_parallel: bool = True,
) -> DataFrame:
    """Quadtree (multi-resolution) covering dim: O(perimeter) rows
    instead of O(area) — coarse fully-contained cells carry most of the
    polygon interior, fine cells trace the boundary. Same schema as
    ``build_polygon_cells``; cell ids self-describe their resolution.

    SEED-PARALLEL (``seed_parallel=True``): phase 1 fans each polygon
    out to its bbox cover at ``res_min`` (one cheap pass); the
    (polygon, seed-cell) rows then reshuffle so phase 2 refines every
    seed independently. One country-sized polygon no longer serializes
    in a single task — its quadtree spreads across the whole cluster,
    and output rows are identical to the single-task recursion (each
    seed's subtree is independent).

    ``seed_parallel=False`` runs the whole quadtree per polygon in ONE
    Arrow crossing (polygons spread across tasks, recursion local).
    The seed reshuffle duplicates each polygon's WKB once per seed
    cell, so for dims of small polygons the fan-out costs more than
    the parallelism buys — ``point_in_polygon_join`` auto-selects the
    single-pass path when the probed dim has no polygon large enough
    to dominate a task (same auto-route philosophy as the broadcast
    decision)."""
    out_schema = f"cell long, {id_col} long, fully_contained boolean"
    spark = polygons_df.sparkSession
    n_slices = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    if not seed_parallel:
        def one_pass(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                packed = wkb.pack(pdf[geom_col].tolist())
                pi, cells, full = cover.cover_polygons_adaptive(
                    packed, res_min, res_max
                )
                yield pd.DataFrame(
                    {
                        "cell": cells,
                        id_col: pdf[id_col].to_numpy()[pi],
                        "fully_contained": full,
                    }
                )

        cells_df = (
            polygons_df.select(id_col, geom_col)
            .repartition(n_slices)
            .mapInPandas(one_pass, out_schema)
        )
        if num_partitions:
            cells_df = cells_df.repartitionByRange(num_partitions, "cell")
        return cells_df

    def seeds(batches):
        for pdf in batches:
            packed = wkb.pack(pdf[geom_col].tolist())
            bb = packed.bbox
            valid = np.flatnonzero(np.isfinite(bb[:, 0]))
            if valid.size == 0:
                continue
            src, cells = grid.cover_bbox(
                bb[valid, 0], bb[valid, 1], bb[valid, 2], bb[valid, 3],
                res_min, max_cells=262_144 * max(valid.size, 1),
            )
            pi = valid[src]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy()[pi],
                    "geom": pdf[geom_col].to_numpy()[pi],
                    "cell": cells,
                }
            )

    def refine(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # pack each distinct polygon once per batch, map seeds to
            # its slot
            uniq = pdf.drop_duplicates(id_col)
            packed = wkb.pack(uniq["geom"].tolist())
            slot = {p: i for i, p in enumerate(uniq[id_col])}
            seed_slots = pdf[id_col].map(slot).to_numpy(np.int64)
            pi, cells, full = cover.refine_cells(
                packed, seed_slots, pdf["cell"].to_numpy(np.int64),
                res_min, res_max,
            )
            yield pd.DataFrame(
                {
                    "cell": cells,
                    id_col: uniq[id_col].to_numpy()[pi],
                    "fully_contained": full,
                }
            )

    seeds_df = polygons_df.select(id_col, geom_col).mapInPandas(
        seeds, f"{id_col} long, geom binary, cell long"
    )
    cells_df = seeds_df.repartition(n_slices).mapInPandas(
        refine, out_schema
    )
    if num_partitions:
        cells_df = cells_df.repartitionByRange(num_partitions, "cell")
    return cells_df


def _broadcast_polygons(points_df: DataFrame, polygons_df, geom_col, id_col):
    """Collect the polygon dim to a {id: wkb} map and broadcast it to
    executors (the STRtree-packed broadcast side of the north_star —
    packing happens lazily per python worker)."""
    rows = polygons_df.select(id_col, geom_col).collect()
    mapping = {r[0]: bytes(r[1]) for r in rows if r[1] is not None}
    return points_df.sparkSession.sparkContext.broadcast(mapping)


_PROBE_ROWS = 4096  # row bound for the single-job fast probe


def _probe_polygon_dim(polygons_df, geom_col, id_col, max_bytes):
    """Byte-bounded auto-route probe. Two tiers:

    FAST PATH (the common admin/region dim): one cheap column-pruned
    job counts up to ``_PROBE_ROWS + 1`` ids; when the dim has at most
    ``_PROBE_ROWS`` rows, a single ``collect`` both decides the route
    and materializes the broadcast {id: wkb} map. ``toLocalIterator``
    here would launch one sequential job per partition — measured as
    the dominant constant cost of the sf0.1 flagship (32 near-empty
    partitions for 60 polygons).

    BIG-DIM PATH: stream through ``toLocalIterator`` accumulating the
    map and ABORT the moment the byte budget is exceeded — a
    planet-scale dim is read at most ``max_bytes`` + one partition
    deep, never fully scanned or OOM-collected.

    Returns (mapping, fits, max_polygon_bytes); ``mapping`` is None
    when the dim doesn't fit, ``max_polygon_bytes`` covers only the
    rows actually probed (exact whenever ``fits``)."""
    dim = polygons_df.select(id_col, geom_col)
    n_rows = dim.select(id_col).limit(_PROBE_ROWS + 1).count()
    mapping: dict = {}
    total = 0
    max_poly = 0
    if n_rows <= _PROBE_ROWS:
        # size executor-side first so an over-budget dim of few huge
        # polygons is never collected to the driver
        stats = dim.agg(
            F.sum(F.length(geom_col)), F.max(F.length(geom_col))
        ).first()
        total, max_poly = int(stats[0] or 0), int(stats[1] or 0)
        if total > max_bytes:
            return None, False, max_poly
        for r in dim.collect():
            if r[1] is not None:
                mapping[r[0]] = bytes(r[1])
        return mapping, True, max_poly
    for r in dim.toLocalIterator():
        g = r[1]
        if g is None:
            continue
        total += len(g)
        max_poly = max(max_poly, len(g))
        if total > max_bytes:
            return None, False, max_poly
        mapping[r[0]] = bytes(g)
    return mapping, True, max_poly


def point_in_polygon_join(
    points_df: DataFrame,
    polygons_df: DataFrame,
    res: int | tuple[int, int] = DEFAULT_RES,
    lon_col: str = "lon",
    lat_col: str = "lat",
    geom_col: str = "geom",
    id_col: str = "polygon_id",
    covers: bool = False,
    broadcast_dim: bool | None = None,
    salt: int = 0,
    polygon_cells_df: DataFrame | None = None,
    broadcast_max_bytes: int = 64 << 20,
) -> DataFrame:
    """points ⋈ polygons on containment. Returns ``points_df`` columns +
    ``id_col`` (one output row per (point, containing polygon) pair).

    ``res`` may be a single resolution or a ``(res_min, res_max)`` tuple
    for the multi-resolution (quadtree) covering: the point side then
    joins on the array of its ancestor cells (one native explode — a
    polygon's covering cells are disjoint regions, so each point still
    matches each polygon at most once).

    ``broadcast_dim=None`` (default) AUTO-ROUTES with a byte-bounded
    streamed probe (``_probe_polygon_dim``): the dim streams through
    ``toLocalIterator`` into the broadcast map and ABORTS the moment
    ``broadcast_max_bytes`` is exceeded — one pass both decides the
    route and materializes the broadcast side, so the small-dim case
    pays no separate sizing job and a planet-scale dim is read at most
    budget-deep, never fully scanned or OOM-collected. Pass
    ``broadcast_dim=True/False`` to force a path explicitly.

    ``salt > 1`` replicates dim-side cell rows across ``salt`` lanes and
    routes each point to one lane — bounding the per-reducer pair
    fan-out for pathologically hot cells (dense-urban skew, north_rule).
    Salting only applies to the SHUFFLE join path: a broadcast hash join
    has no reducers — every input partition probes the broadcast table
    locally, so cell skew cannot concentrate work, and salting would
    only inflate the broadcast ``salt``-fold. With ``broadcast_dim``
    the salt argument is therefore ignored.
    """
    poly_map = None
    seed_parallel = True
    if broadcast_dim is None:
        poly_map, broadcast_dim, max_poly_bytes = _probe_polygon_dim(
            polygons_df, geom_col, id_col, broadcast_max_bytes
        )
        # covering fan-out auto-route: the seed reshuffle only pays off
        # when a single polygon's quadtree can dominate a task — for
        # dims of small polygons the one-crossing local recursion wins
        # (this was the sole r5 bench regression at sf0.1's 60 rects)
        seed_parallel = not broadcast_dim or max_poly_bytes > _SEED_PARALLEL_MIN_BYTES
    if isinstance(res, tuple):
        res_min, res_max = res
        pcells = (
            polygon_cells_df
            if polygon_cells_df is not None
            else build_polygon_cells_adaptive(
                polygons_df, res_min, res_max, geom_col, id_col,
                seed_parallel=seed_parallel,
            )
        )
        ancestors = F.array(
            *[cell_expr(lon_col, lat_col, r) for r in range(res_min, res_max + 1)]
        )
        pts = points_df.withColumn("__cell", F.explode(ancestors)).filter(
            F.col("__cell") >= 0
        )
    else:
        pcells = (
            polygon_cells_df
            if polygon_cells_df is not None
            else build_polygon_cells(polygons_df, res, geom_col, id_col)
        )
        pts = points_df.withColumn("__cell", cell_expr(lon_col, lat_col, res)).filter(
            F.col("__cell") >= 0
        )
    dim = pcells.withColumnRenamed("cell", "__cell")
    if broadcast_dim:
        salt = 0
    if salt > 1:
        dim = dim.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
        )
        pts = pts.withColumn(
            "__salt", (F.pmod(F.xxhash64(lon_col, lat_col), F.lit(salt))).cast("int")
        )
        join_keys = ["__cell", "__salt"]
    else:
        join_keys = ["__cell"]
    dimj = F.broadcast(dim) if broadcast_dim else dim
    cand = pts.join(dimj, join_keys)

    out_cols = [c for c in points_df.columns] + [id_col]
    out_schema = cand.select(*out_cols).schema
    if not broadcast_dim:
        # PARTITIONED REFINE: the dim is too big to collect/broadcast, so
        # ship each boundary pair its polygon WKB through a left join
        # conditioned on NOT fully_contained (accepted-interior pairs join
        # nothing and carry no geometry) — single-pass, no driver collect,
        # no plan diamond. Geometry bytes duplicate per *boundary* pair
        # only; the ray-cast then needs no broadcast state at all.
        geoms = polygons_df.select(
            F.col(id_col).alias("__geom_id"), F.col(geom_col).alias("__geom")
        )
        cand = cand.join(
            geoms,
            on=(F.col(id_col) == F.col("__geom_id")) & ~F.col("fully_contained"),
            how="left",
        )

        def refine_partitioned(batches):
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                ok = pdf["fully_contained"].to_numpy(copy=True)
                need = np.flatnonzero(~ok)
                if need.size:
                    sub = pdf.iloc[need]
                    # pack each polygon ONCE per batch
                    uniq = sub.drop_duplicates("__geom_id")[["__geom_id", "__geom"]]
                    blobs = [
                        bytes(b) for b in uniq["__geom"] if b is not None
                    ]
                    ids = [
                        i for i, b in zip(uniq["__geom_id"], uniq["__geom"])
                        if b is not None
                    ]
                    if blobs:
                        prep_b = PreparedPolygons(wkb.pack(blobs))
                        idx_b = {p: i for i, p in enumerate(ids)}
                        mapped = sub["__geom_id"].map(idx_b)
                        known = mapped.notna().to_numpy()
                        if known.any():
                            subk = sub.iloc[known] if not known.all() else sub
                            ok[need[known]] = prep_b.contains(
                                subk[lon_col].to_numpy(),
                                subk[lat_col].to_numpy(),
                                mapped.to_numpy()[known].astype(np.int64),
                                covers=covers,
                            )
                yield pdf.loc[ok, [f.name for f in out_schema.fields]]

        return cand.mapInPandas(refine_partitioned, out_schema)

    poly_bc = (
        points_df.sparkSession.sparkContext.broadcast(poly_map)
        if poly_map is not None
        else _broadcast_polygons(points_df, polygons_df, geom_col, id_col)
    )

    def refine(batches):
        # SINGLE-PASS accept/refine: every candidate pair flows through
        # one Arrow crossing; fully_contained pairs pass by boolean mask
        # (no geometry math), boundary pairs get the exact ray-cast.
        # A sure/maybe DataFrame split would look cheaper but makes the
        # plan a diamond — both union branches recompute the whole join
        # (measured 3.9× slower at sf0.1×100). The broadcast dim is
        # packed + edge-indexed ONCE per python worker (the
        # STRtree-packed broadcast partition of the north_star).
        prep = None
        idx_of: dict = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if prep is None:
                mapping = poly_bc.value
                ids = sorted(mapping)
                prep = PreparedPolygons(wkb.pack([mapping[i] for i in ids]))
                idx_of = {p: i for i, p in enumerate(ids)}
            ok = pdf["fully_contained"].to_numpy(copy=True)
            need = np.flatnonzero(~ok)
            if need.size:
                sub = pdf.iloc[need]
                mapped = sub[id_col].map(idx_of)
                # ids in a caller-supplied polygon_cells_df but absent
                # from polygons_df (stale covering) are non-matches, not
                # executor crashes
                known = mapped.notna().to_numpy()
                if known.any():
                    subk = sub.iloc[known] if not known.all() else sub
                    ok[need[known]] = prep.contains(
                        subk[lon_col].to_numpy(), subk[lat_col].to_numpy(),
                        mapped.to_numpy()[known].astype(np.int64), covers=covers,
                    )
            yield pdf.loc[ok, [f.name for f in out_schema.fields]]

    return cand.mapInPandas(refine, out_schema)
