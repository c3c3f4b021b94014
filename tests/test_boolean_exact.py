"""Degeneracy-robust edge-fragment boolean ops (geometry/boolean_exact).

The cases Greiner–Hormann rejects (shared edges/vertices, identical
rings, boundary touches) must produce EXACT results with no coordinate
perturbation; on general-position inputs the module must agree with
the independent even-odd ray cast point-for-point.
"""

import numpy as np
import pytest

from sophox_spark.geometry import boolean_exact as bx
from sophox_spark.geometry import clip, core
from sophox_spark.geometry.pip import point_in_rings


def sq(x0, y0, s):
    return np.array([[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s]], float)


def area(parts):
    return sum(
        abs(core.ring_signed_area(r)) * (-1 if hole else 1) for r, hole in parts
    )


class TestDegenerateExact:
    def test_shared_edge_union_exact(self):
        a, b = sq(0, 0, 2), sq(2, 0, 2)  # share edge x=2
        out = bx.clip_rings_exact(a, b, "union")
        assert len(out) == 1 and not out[0][1]
        assert area(out) == 8.0  # EXACT, no nudge
        # the shared boundary x=2 is gone from the union outline
        xs = set(out[0][0][:, 0])
        assert xs == {0.0, 2.0, 4.0}  # vertices survive exactly

    def test_shared_edge_difference_is_noop(self):
        a, b = sq(0, 0, 2), sq(2, 0, 2)
        out = bx.clip_rings_exact(a, b, "difference")
        assert area(out) == 4.0
        # subject boundary byte-exact (vertices unmoved)
        got = {tuple(p) for p in out[0][0][:-1]}
        assert got == {(0, 0), (2, 0), (2, 2), (0, 2)}

    def test_shared_edge_intersection_empty(self):
        a, b = sq(0, 0, 2), sq(2, 0, 2)
        assert bx.clip_rings_exact(a, b, "intersection") == []

    def test_identical_rings(self):
        a = sq(1, 1, 3)
        assert area(bx.clip_rings_exact(a, a, "union")) == 9.0
        assert area(bx.clip_rings_exact(a, a, "intersection")) == 9.0
        assert bx.clip_rings_exact(a, a, "difference") == []

    def test_shared_vertex_squares(self):
        a, b = sq(0, 0, 1), sq(1, 1, 1)  # touch at (1,1)
        assert area(bx.clip_rings_exact(a, b, "union")) == pytest.approx(2.0)
        assert bx.clip_rings_exact(a, b, "intersection") == []
        assert area(bx.clip_rings_exact(a, b, "difference")) == pytest.approx(1.0)

    def test_partial_edge_overlap(self):
        # b's bottom edge lies ON a's top edge, offset: collinear overlap
        a, b = sq(0, 0, 2), np.array([[1, 2], [3, 2], [3, 4], [1, 4]], float)
        u = bx.clip_rings_exact(a, b, "union")
        assert area(u) == pytest.approx(8.0)
        d = bx.clip_rings_exact(a, b, "difference")
        assert area(d) == pytest.approx(4.0)
        assert bx.clip_rings_exact(a, b, "intersection") == []

    def test_clipper_inside_touching_boundary(self):
        # clipper inside subject, one edge ON the subject's edge
        a = sq(0, 0, 4)
        b = np.array([[1, 0], [3, 0], [3, 1], [1, 1]], float)  # sits on y=0
        d = bx.clip_rings_exact(a, b, "difference")
        assert area(d) == pytest.approx(16 - 2)
        # point checks: bitten area out, rest in
        def in_d(x, y):
            exts = [(r, False) for r, h in d if not h]
            holes = [(r, False) for r, h in d if h]
            return point_in_rings(x, y, exts) and not (
                holes and point_in_rings(x, y, holes))
        assert not in_d(2.0, 0.5)
        assert in_d(0.5, 0.5) and in_d(2.0, 2.0)

    def test_strict_containment_hole(self):
        a, b = sq(0, 0, 4), sq(1, 1, 1)
        d = bx.clip_rings_exact(a, b, "difference")
        holes = [r for r, h in d if h]
        assert len(holes) == 1 and area(d) == pytest.approx(15.0)
        assert bx.clip_rings_exact(b, a, "difference") == []
        assert area(bx.clip_rings_exact(a, b, "intersection")) == pytest.approx(1.0)
        assert area(bx.clip_rings_exact(a, b, "union")) == pytest.approx(16.0)

    def test_cw_inputs_normalized(self):
        a, b = sq(0, 0, 2)[::-1], sq(2, 0, 2)[::-1]
        assert area(bx.clip_rings_exact(a, b, "union")) == 8.0


class TestGeneralPositionEquivalence:
    def test_matches_raycast_on_random_stars(self):
        """p ∈ op(A,B) ⟺ op(p∈A, p∈B) — same oracle the GH clipper is
        held to, so both clippers are pinned to the same semantics."""
        rng = np.random.default_rng(11)

        def star(cx, cy, rm, n=10):
            ang = np.sort(rng.uniform(0, 2 * np.pi, n))
            rad = rng.uniform(0.4, 1.0, n) * rm
            return np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang)], axis=1)

        closed = lambda r: np.vstack([r, r[:1]])  # noqa: E731
        preds = {
            "intersection": lambda a, b: a and b,
            "union": lambda a, b: a or b,
            "difference": lambda a, b: a and not b,
        }
        tested = 0
        for _ in range(10):
            P = star(0, 0, 1.0)
            Q = star(rng.uniform(-0.8, 0.8), rng.uniform(-0.8, 0.8), 1.0)
            for op, pred in preds.items():
                parts = bx.clip_rings_exact(P, Q, op)
                for x, y in rng.uniform(-2, 2, (200, 2)):
                    a = point_in_rings(x, y, [(closed(P), False)])
                    b = point_in_rings(x, y, [(closed(Q), False)])
                    assert point_in_rings(x, y, parts) == pred(a, b), (op, x, y)
                    tested += 1
        assert tested > 4000


class TestRobustIntegration:
    def test_robust_uses_exact_no_perturbation(self):
        """clip_rings_robust resolves shared-edge contacts through the
        exact path: vertices in the result are EXACT input vertices (a
        perturbed clip would show 1e-9-scale noise)."""
        a, b = sq(0, 0, 2), sq(2, 0, 2)
        res = clip.clip_rings_robust(a, b, "union")
        pts = {tuple(p) for r, _ in res for p in r}
        assert pts <= {(0.0, 0.0), (2.0, 0.0), (4.0, 0.0), (4.0, 2.0),
                       (2.0, 2.0), (0.0, 2.0)}

    def test_adjacent_rect_dissolve_zero_fallbacks(self):
        """The verdict's done criterion: adjacent rectangles dissolve
        with n_fallbacks == 0 and NO perturbation retries."""
        chain = [[sq(float(i), 0.0, 1.0)] for i in range(5)]  # shared edges
        merged, fb = clip.union_parts(chain)
        assert fb == 0
        assert len(merged) == 1
        assert abs(core.ring_signed_area(merged[0][0])) == 5.0  # exact
