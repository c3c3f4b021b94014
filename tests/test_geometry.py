"""Geometry kernel goldens: WKB codec, ray-cast PIP, STRtree, covering,
simplification. Oracles are independent brute-force reimplementations
inside the test (different code path from the kernels)."""

import numpy as np
import pytest

from sophox_spark.cells import grid
from sophox_spark.geometry import core, cover, simplify, strtree, wkb
from sophox_spark.geometry.pip import PreparedPolygons, point_in_rings

rng = np.random.default_rng(7)


def square(cx, cy, half):
    return np.array(
        [
            [cx - half, cy - half],
            [cx + half, cy - half],
            [cx + half, cy + half],
            [cx - half, cy + half],
            [cx - half, cy - half],
        ]
    )


def star(cx, cy, r_out, r_in, n=5):
    ang = np.linspace(0, 2 * np.pi, 2 * n, endpoint=False)
    r = np.where(np.arange(2 * n) % 2 == 0, r_out, r_in)
    pts = np.column_stack([cx + r * np.cos(ang), cy + r * np.sin(ang)])
    return np.vstack([pts, pts[:1]])


DONUT = wkb.polygon_wkb([square(0, 0, 10), square(0, 0, 3)])  # hole in middle
STAR = wkb.polygon_wkb([star(50, 20, 8, 3)])
MULTI = wkb.multipolygon_wkb([[square(-50, -50, 5)], [square(-30, -50, 2)]])


class TestWkb:
    def test_point_roundtrip(self):
        g = wkb.decode_one(wkb.point_wkb(12.5, -3.25))
        assert g[0][0].tolist() == [[12.5, -3.25]]

    def test_polygon_roundtrip(self):
        g = wkb.decode_one(DONUT)
        assert len(g) == 1 and len(g[0]) == 2
        assert np.array_equal(g[0][0], square(0, 0, 10))

    def test_multipolygon_pack(self):
        packed = wkb.pack([DONUT, STAR, MULTI, None])
        assert packed.n_geoms == 4
        assert packed.ring_poly.tolist() == [0, 0, 1, 2, 2]
        assert packed.ring_is_hole.tolist() == [False, True, False, False, False]
        # bbox of the donut
        assert packed.bbox[0].tolist() == [-10, -10, 10, 10]
        # missing geometry → empty bbox
        assert not np.isfinite(packed.bbox[3, 0])


class TestPip:
    def test_against_scalar_oracle(self):
        packed = wkb.pack([DONUT, STAR, MULTI])
        prep = PreparedPolygons(packed)
        px = rng.uniform(-60, 60, 3000)
        py = rng.uniform(-60, 60, 3000)
        for gi in range(3):
            rings = list(packed.rings_of(gi))
            got = prep.contains(px, py, np.full(px.size, gi))
            want = np.array([point_in_rings(x, y, rings) for x, y in zip(px, py)])
            assert np.array_equal(got, want)

    def test_donut_hole_excluded(self):
        packed = wkb.pack([DONUT])
        prep = PreparedPolygons(packed)
        got = prep.contains([0.0, 5.0, 20.0], [0.0, 5.0, 0.0], [0, 0, 0])
        assert got.tolist() == [False, True, False]  # hole, ring body, outside

    def test_covers_boundary(self):
        packed = wkb.pack([square_wkb := wkb.polygon_wkb([square(0, 0, 1)])])
        prep = PreparedPolygons(packed)
        # exactly on the edge and on a vertex
        on_edge = prep.contains([1.0, 1.0], [0.0, 1.0], [0, 0], covers=True)
        assert on_edge.tolist() == [True, True]
        strict = prep.contains([1.0], [0.0], [0])
        assert not strict[0]


class TestStrtree:
    def test_point_candidates_match_bruteforce(self):
        boxes = np.column_stack(
            [
                rng.uniform(-100, 100, 500),
                rng.uniform(-100, 100, 500),
                np.zeros(500),
                np.zeros(500),
            ]
        )
        boxes[:, 2] = boxes[:, 0] + rng.uniform(0.1, 20, 500)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(0.1, 20, 500)
        tree = strtree.STRtree(boxes)
        px = rng.uniform(-110, 110, 400)
        py = rng.uniform(-110, 110, 400)
        qi, bi = tree.query_points(px, py)
        got = set(zip(qi.tolist(), bi.tolist()))
        want = set()
        for i in range(400):
            hits = np.flatnonzero(
                (boxes[:, 0] <= px[i]) & (px[i] <= boxes[:, 2])
                & (boxes[:, 1] <= py[i]) & (py[i] <= boxes[:, 3])
            )
            want |= {(i, int(h)) for h in hits}
        assert got == want

    def test_bbox_query_matches_bruteforce(self):
        boxes = np.column_stack(
            [
                rng.uniform(-50, 50, 300),
                rng.uniform(-50, 50, 300),
                np.zeros(300),
                np.zeros(300),
            ]
        )
        boxes[:, 2] = boxes[:, 0] + rng.uniform(0.1, 10, 300)
        boxes[:, 3] = boxes[:, 1] + rng.uniform(0.1, 10, 300)
        tree = strtree.STRtree(boxes)
        q = np.array([[-5.0, -5.0, 5.0, 5.0], [40.0, 40.0, 60.0, 60.0]])
        qi, bi = tree.query_bbox(q)
        got = set(zip(qi.tolist(), bi.tolist()))
        want = set()
        for i, (x0, y0, x1, y1) in enumerate(q):
            hits = np.flatnonzero(
                (boxes[:, 0] <= x1) & (boxes[:, 2] >= x0)
                & (boxes[:, 1] <= y1) & (boxes[:, 3] >= y0)
            )
            want |= {(i, int(h)) for h in hits}
        assert got == want

    def test_empty_tree(self):
        tree = strtree.STRtree(np.empty((0, 4)))
        qi, bi = tree.query_points([1.0], [1.0])
        assert qi.size == 0 and bi.size == 0


class TestCore:
    def test_signed_area_orientation(self):
        ccw = square(0, 0, 1)[::-1]  # square() is CW (y-down order); reversed = CCW
        assert core.ring_signed_area(ccw) == pytest.approx(-core.ring_signed_area(square(0, 0, 1)))
        assert abs(core.ring_signed_area(square(0, 0, 1))) == pytest.approx(4.0)

    def test_force_rhr(self):
        rings = core.force_rhr([square(0, 0, 2), square(0, 0, 1)])
        assert not core.is_ccw(rings[0]) and core.is_ccw(rings[1])

    def test_centroid_donut(self):
        packed = wkb.pack([DONUT])
        a, cx, cy = core.rings_area_centroid(list(packed.rings_of(0)))
        assert a == pytest.approx(400 - 36)
        assert cx == pytest.approx(0.0) and cy == pytest.approx(0.0)

    def test_representative_point_inside(self):
        for blob in (DONUT, STAR, MULTI):
            packed = wkb.pack([blob])
            rings = list(packed.rings_of(0))
            x, y = core.polygon_representative_point(rings)
            assert point_in_rings(x, y, rings)

    def test_is_closed(self):
        assert core.is_closed(square(0, 0, 1))
        assert not core.is_closed(square(0, 0, 1)[:-1])

    def test_haversine_known(self):
        # quarter meridian ≈ 10,007.5 km
        d = core.haversine_m([0.0], [0.0], [0.0], [90.0])
        assert d[0] == pytest.approx(np.pi / 2 * core.EARTH_RADIUS_M, rel=1e-9)


class TestCover:
    def test_cover_superset_and_refine_consistency(self):
        packed = wkb.pack([DONUT, STAR])
        prep = PreparedPolygons(packed)
        res = 12
        poly_idx, cells, full = cover.cover_polygons(packed, res)
        cellset = {(int(p), int(c)) for p, c in zip(poly_idx, cells)}
        # random points inside each polygon must land in a covered cell
        px = rng.uniform(-12, 60, 5000)
        py = rng.uniform(-12, 30, 5000)
        for gi in range(2):
            inside = prep.contains(px, py, np.full(px.size, gi))
            pc = grid.encode(px[inside], py[inside], res)
            for c in pc.tolist():
                assert (gi, c) in cellset
        # fully_contained cells: every corner must be inside
        for p, c, f in zip(poly_idx, cells, full):
            if f:
                lon0, lat0, lon1, lat1 = (float(v[0]) for v in grid.cell_bounds([c]))
                got = prep.contains(
                    [lon0, lon1, lon0, lon1], [lat0, lat0, lat1, lat1], [p] * 4
                )
                assert got.all()

    def test_hole_cells_dropped(self):
        packed = wkb.pack([DONUT])
        _, cells, _ = cover.cover_polygons(packed, 12)
        # the very center of the hole must not be covered
        center_cell = int(grid.encode([0.0], [0.0], 12)[0])
        assert center_cell not in set(cells.tolist())


class TestSimplify:
    def test_effective_area_monotone_filterable(self):
        ring = star(0, 0, 10, 4, n=12)
        eff = simplify.presimplify(ring, spherical=False)
        assert np.isinf(eff[0]) and np.isinf(eff[-1])
        # simplifying at increasing thresholds yields nested vertex sets
        t1 = simplify.area_quantile(eff, 0.3)
        t2 = simplify.area_quantile(eff, 0.7)
        k1 = set(np.flatnonzero(eff >= t1).tolist())
        k2 = set(np.flatnonzero(eff >= t2).tolist())
        assert k2 <= k1

    def test_collinear_removed_first(self):
        ring = np.array([[0, 0], [1, 0], [2, 0], [2, 2], [0, 2], [0, 0]], dtype=float)
        eff = simplify.presimplify(ring, spherical=False)
        assert eff[1] == 0.0  # collinear vertex has zero triangle area
        out = simplify.simplify_ring(ring, eff, 1e-12, min_vertices=4)
        assert len(out) == 5

    def test_quantize_roundtrip_grid(self):
        coords = rng.uniform(0, 1, (100, 2))
        q = simplify.quantize(coords, (0, 0, 1, 1), 10_000)
        assert q.min() >= 0 and q.max() <= 9999
        back = q / 9999.0
        assert np.abs(back - coords).max() < 1e-4 + 1e-9

    def test_tile_xyz_known(self):
        # lon 0, lat 0 at z=1 → tile (1, 1); Berlin at z=10 → known tile
        x, y = simplify.tile_xyz([0.0], [0.0], 1)
        assert (int(x[0]), int(y[0])) == (1, 1)
        x, y = simplify.tile_xyz([13.4], [52.52], 10)
        assert (int(x[0]), int(y[0])) == (550, 335)

    def test_spherical_area_octant(self):
        # the (0,0),(90,0),(0,90) triangle is 1/8 of the sphere = π/2 sr
        a = simplify.triangle_area_spherical([0, 0], [90, 0], [0, 90])
        assert a == pytest.approx(np.pi / 2, rel=1e-9)


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
