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
  2. FILTER (fact-side): points get a cell id (vectorized numpy inside a
     pandas UDF) and equi-join ``polygon_cells`` on ``cell`` — a plain
     Catalyst hash join; the dim side is broadcast when small. Skewed
     cells are AQE-split (spark.sql.adaptive.skewJoin) and, for the
     pathological city-cell case, the dim is salted (``salt`` arg):
     polygon_cells rows replicate ``salt`` ways, points pick one salt
     lane — a two-phase shuffle that caps any single task's pair count.
  3. ACCEPT/REFINE: pairs in ``fully_contained`` cells are inside by
     construction (no Python at all — most of the area of big admin
     polygons); boundary-cell pairs are ray-cast exactly against the
     broadcast packed polygons in one Arrow batch pass.

At 100 TB the only shuffle is the fact-side hash on ``cell`` (and none
at all when the dim broadcasts); refinement cost is proportional to
*boundary* candidate pairs only.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..cells import grid
from ..geometry import cover, wkb
from ..geometry.pip import PreparedPolygons

DEFAULT_RES = 13  # ≈ 2.4 km cells (H3 res-7 analog, grid.H3_ANALOG_RES)


def cell_col(lon_col: str, lat_col: str, res: int):
    """Column expression: grid cell id of (lon, lat) at ``res``."""

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

    cells_df = polygons_df.select(id_col, geom_col).mapInPandas(gen, out_schema)
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


def point_in_polygon_join(
    points_df: DataFrame,
    polygons_df: DataFrame,
    res: int = DEFAULT_RES,
    lon_col: str = "lon",
    lat_col: str = "lat",
    geom_col: str = "geom",
    id_col: str = "polygon_id",
    covers: bool = False,
    broadcast_dim: bool = True,
    salt: int = 0,
    polygon_cells_df: DataFrame | None = None,
) -> DataFrame:
    """points ⋈ polygons on containment. Returns ``points_df`` columns +
    ``id_col`` (one output row per (point, containing polygon) pair).

    ``salt > 1`` replicates dim-side cell rows across ``salt`` lanes and
    routes each point to one lane — bounding the per-task pair fan-out
    for pathologically hot cells (dense-urban skew, north_rule).
    """
    pcells = (
        polygon_cells_df
        if polygon_cells_df is not None
        else build_polygon_cells(polygons_df, res, geom_col, id_col)
    )
    pts = points_df.withColumn("__cell", cell_col(lon_col, lat_col, res)).filter(
        F.col("__cell") >= 0
    )
    dim = pcells.withColumnRenamed("cell", "__cell")
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
    sure = cand.filter(F.col("fully_contained")).select(*out_cols)
    maybe = cand.filter(~F.col("fully_contained"))

    poly_bc = _broadcast_polygons(points_df, polygons_df, geom_col, id_col)
    maybe = maybe.drop("fully_contained", "__salt")  # drop ignores missing cols
    maybe_schema = maybe.schema

    def refine(batches):
        prep_cache: dict[tuple, tuple] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].unique()
            key = tuple(sorted(ids.tolist()))
            if key not in prep_cache:
                mapping = poly_bc.value
                packed = wkb.pack([mapping.get(i) for i in key])
                prep_cache = {key: (PreparedPolygons(packed), {p: i for i, p in enumerate(key)})}
            prep, idx_of = prep_cache[key]
            poly_idx = pdf[id_col].map(idx_of).to_numpy()
            ok = prep.contains(
                pdf[lon_col].to_numpy(), pdf[lat_col].to_numpy(), poly_idx, covers=covers
            )
            yield pdf[ok]

    refined = maybe.mapInPandas(refine, maybe_schema).select(*out_cols)
    return sure.unionByName(refined)
