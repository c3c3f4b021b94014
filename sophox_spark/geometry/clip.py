"""Polygon boolean operations — Greiner–Hormann clipping.

The reference's regions pipeline does true vector geometry algebra in
PostGIS: ``ST_Multi(ST_Union(way))`` dissolves all parts of a wikidata
id (/root/reference/osm-regions-server/osm-regions/wd_only_sql.js:8-17)
and ``ST_Difference(geom, ST_Union(water))`` subtracts water bodies
before serving region shapes (wd_only_sql.js:23-28). This module is the
from-scratch numpy re-implementation used inside Arrow batches: the
classic Greiner–Hormann traversal (Greiner & Hormann, ACM TOG 1998 —
public algorithm) for ``intersection`` / ``union`` / ``difference`` of
simple rings, plus containment special-cases (hole creation / absorb)
when the boundaries do not cross.

Degeneracy policy: vertex-on-edge contacts and collinear edge overlaps
raise :class:`DegenerateGeometry` instead of silently producing wrong
rings; callers fall back to multipart assembly (union) or keep the
subject unchanged (difference) and surface the count of such fallbacks.
This is honest scoping, not hidden failure — real OSM data in general
position clips exactly; shared-boundary inputs need snap-rounding,
which is out of scope (documented in SURVEY §8.7).
"""

from __future__ import annotations

import numpy as np

from .core import ring_signed_area
from .pip import point_in_rings


class DegenerateGeometry(ValueError):
    """Boundaries touch without properly crossing (vertex-on-edge or
    collinear overlap) — Greiner–Hormann needs general position."""


class _Node:
    __slots__ = ("pt", "next", "prev", "neighbor", "entry", "is_inter", "visited")

    def __init__(self, pt):
        self.pt = (float(pt[0]), float(pt[1]))
        self.next = None
        self.prev = None
        self.neighbor = None
        self.entry = False
        self.is_inter = False
        self.visited = False


def _open_ring(ring: np.ndarray) -> np.ndarray:
    ring = np.asarray(ring, dtype=np.float64)
    if len(ring) > 1 and np.array_equal(ring[0], ring[-1]):
        ring = ring[:-1]
    return ring


def _build_list(ring: np.ndarray) -> list[_Node]:
    nodes = [_Node(p) for p in ring]
    n = len(nodes)
    for i, nd in enumerate(nodes):
        nd.next = nodes[(i + 1) % n]
        nd.prev = nodes[(i - 1) % n]
    return nodes


def _intersections(a: np.ndarray, b: np.ndarray):
    """All proper crossings between edges of rings a and b (both open).
    Returns list of (ia, ta, ib, tb, point). Raises DegenerateGeometry
    on endpoint-touch or collinear-overlap contacts."""
    a2 = np.roll(a, -1, axis=0)
    b2 = np.roll(b, -1, axis=0)
    out = []
    eps = 1e-12
    for ia in range(len(a)):
        p, r = a[ia], a2[ia] - a[ia]
        # vectorized over all edges of b
        q, s = b, b2 - b
        denom = r[0] * s[:, 1] - r[1] * s[:, 0]
        qp = q - p
        t_num = qp[:, 0] * s[:, 1] - qp[:, 1] * s[:, 0]
        u_num = qp[:, 0] * r[1] - qp[:, 1] * r[0]
        with np.errstate(divide="ignore", invalid="ignore"):
            t = np.where(denom != 0, t_num / denom, np.inf)
            u = np.where(denom != 0, u_num / denom, np.inf)
        proper = (t > eps) & (t < 1 - eps) & (u > eps) & (u < 1 - eps)
        touch = (
            (t >= -eps) & (t <= 1 + eps) & (u >= -eps) & (u <= 1 + eps) & ~proper
        ) & (denom != 0)
        # collinear overlapping edges: parallel (denom == 0) AND q on
        # the p→r line (cross(q−p, r) == 0), with overlapping projection
        collinear = (denom == 0) & (np.abs(u_num) < eps)
        if collinear.any():
            rlen2 = float(np.dot(r, r))
            for ib in np.flatnonzero(collinear):
                if rlen2 <= 0:
                    continue
                t0 = float(np.dot(q[ib] - p, r)) / rlen2
                t1 = t0 + float(np.dot(s[ib], r)) / rlen2
                lo, hi = min(t0, t1), max(t0, t1)
                if hi > eps and lo < 1 - eps:
                    raise DegenerateGeometry("collinear edge overlap")
        if touch.any():
            raise DegenerateGeometry("vertex-on-edge contact")
        for ib in np.flatnonzero(proper):
            pt = p + t[ib] * r
            out.append((ia, float(t[ib]), int(ib), float(u[ib]), pt))
    return out


def _insert_intersections(nodes_a, nodes_b, inters):
    """Insert linked intersection nodes into both circular lists."""
    by_a: dict[int, list] = {}
    by_b: dict[int, list] = {}
    pairs = []
    for ia, ta, ib, tb, pt in inters:
        na, nb = _Node(pt), _Node(pt)
        na.is_inter = nb.is_inter = True
        na.neighbor, nb.neighbor = nb, na
        by_a.setdefault(ia, []).append((ta, na))
        by_b.setdefault(ib, []).append((tb, nb))
        pairs.append(na)
    for base_nodes, by in ((nodes_a, by_a), (nodes_b, by_b)):
        for ei, lst in by.items():
            lst.sort(key=lambda x: x[0])
            cur = base_nodes[ei]
            for _, nd in lst:
                nxt = cur.next
                cur.next, nd.prev = nd, cur
                nd.next, nxt.prev = nxt, nd
                cur = nd
    return pairs


def _mark_entries(first: _Node, other_rings, flip: bool):
    """Alternate entry/exit flags along one list, seeded by whether the
    list's first ORIGINAL vertex is inside the other polygon."""
    status = not point_in_rings(first.pt[0], first.pt[1], other_rings)
    if flip:
        status = not status
    nd = first
    while True:
        if nd.is_inter:
            nd.entry = status
            status = not status
        nd = nd.next
        if nd is first:
            break


def _traverse(pairs):
    """Greiner–Hormann traversal: walk entry→forward / exit→backward,
    switching lists at every intersection."""
    results = []
    for start in pairs:
        if start.visited:
            continue
        ring = [start.pt]
        cur = start
        while True:
            cur.visited = cur.neighbor.visited = True
            if cur.entry:
                while True:
                    cur = cur.next
                    ring.append(cur.pt)
                    if cur.is_inter:
                        break
            else:
                while True:
                    cur = cur.prev
                    ring.append(cur.pt)
                    if cur.is_inter:
                        break
            cur = cur.neighbor
            if cur.visited:
                break
        arr = np.asarray(ring, dtype=np.float64)
        if len(arr) >= 4 and abs(ring_signed_area(arr)) > 0:
            results.append(arr)
    return results


# entry-flag XOR masks (subject, clipper) for the shared traversal:
# difference = A ∩ Bᶜ ⇒ flip the SUBJECT seed (its inside-test is w.r.t.
# the complemented clipper); validated by 48k-point classification
# equivalence in tests/test_geometry.py
_FLIPS = {"intersection": (False, False), "union": (True, True), "difference": (True, False)}


def clip_rings(subject: np.ndarray, clipper: np.ndarray, op: str):
    """Boolean op between two simple rings.

    Returns a list of ``(closed_ring, is_hole)`` pairs. Crossing
    boundaries produce boundary rings only; the containment cases
    produce the hole (difference with clipper strictly inside subject)
    or absorb/keep results. Raises DegenerateGeometry when boundaries
    touch without crossing."""
    sub = _open_ring(subject)
    clp = _open_ring(clipper)
    sub_closed = [(np.vstack([sub, sub[:1]]), False)]
    clp_closed = [(np.vstack([clp, clp[:1]]), False)]
    inters = _intersections(sub, clp)
    if not inters:
        s_in_c = point_in_rings(sub[0, 0], sub[0, 1], clp_closed)
        c_in_s = point_in_rings(clp[0, 0], clp[0, 1], sub_closed)
        if op == "intersection":
            if s_in_c:
                return [(sub_closed[0][0], False)]
            if c_in_s:
                return [(clp_closed[0][0], False)]
            return []
        if op == "union":
            if s_in_c:
                return [(clp_closed[0][0], False)]
            if c_in_s:
                return [(sub_closed[0][0], False)]
            return [(sub_closed[0][0], False), (clp_closed[0][0], False)]
        if op == "difference":
            if s_in_c:
                return []
            if c_in_s:  # clipper strictly inside subject → hole
                return [(sub_closed[0][0], False), (clp_closed[0][0], True)]
            return [(sub_closed[0][0], False)]
        raise ValueError(f"unknown op {op!r}")
    nodes_a = _build_list(sub)
    nodes_b = _build_list(clp)
    pairs = _insert_intersections(nodes_a, nodes_b, inters)
    flip_a, flip_b = _FLIPS[op]
    _mark_entries(nodes_a[0], clp_closed, flip_a)
    _mark_entries(nodes_b[0], sub_closed, flip_b)
    out = _traverse(pairs)
    closed = []
    for r in out:
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        closed.append((r, False))
    return closed


def clip_rings_robust(subject: np.ndarray, clipper: np.ndarray, op: str,
                      retries: int = 3):
    """``clip_rings`` with EXACT degenerate-contact resolution.

    Shared vertices / collinear edges (ubiquitous when OSM parts share
    admin boundaries) violate Greiner–Hormann's general-position
    requirement. Degenerate contacts now resolve through the
    edge-fragment-selection clipper (geometry/boolean_exact.py), which
    never moves a vertex — shared boundaries stay byte-identical and
    adjacent parts dissolve with zero fallbacks. Only if that stitch
    fails does the old deterministic micro-perturbation retry run
    (clipper nudged ≤ extent·1e-9, seeded PCG — bit-reproducible; the
    subject is never moved).

    Raises DegenerateGeometry only if every path stays degenerate."""
    try:
        return clip_rings(subject, clipper, op)
    except DegenerateGeometry:
        pass
    from . import boolean_exact

    try:
        return boolean_exact.clip_rings_exact(subject, clipper, op)
    except boolean_exact.StitchError:
        pass
    clp = np.asarray(clipper, dtype=np.float64)
    extent = max(float(np.ptp(clp[:, 0])), float(np.ptp(clp[:, 1])), 1e-6)
    for retry in range(retries):
        rng = np.random.default_rng(0xC11B + retry)
        opened = _open_ring(clp)
        nudged = opened + rng.uniform(-1.0, 1.0, opened.shape) * (
            extent * 1e-9 * 10.0**retry
        )
        try:
            return clip_rings(subject, np.vstack([nudged, nudged[:1]]), op)
        except DegenerateGeometry:
            continue
    raise DegenerateGeometry(f"degenerate after {retries} perturbation retries")


def difference_with_holes(poly: list[np.ndarray], clipper: np.ndarray):
    """(exterior, *holes) − clipper. A clipper strictly inside a hole is
    a no-op. Existing holes are CLIPPED to each surviving exterior
    piece: a hole the clipper cuts through keeps exactly its fragment
    inside the remainder (rep-point keep-or-drop would silently re-add
    the cut part of the hole as land — order-dependent wrong areas).
    Holes never overlap each other when the subtracted clippers are
    mutually disjoint (the hydrography contract); overlapping clippers
    keep correct point-membership but can double-count hole area.
    Returns a list of polygons, each ``[exterior, *holes]``."""
    exterior, holes = poly[0], list(poly[1:])
    for h in holes:
        h_closed = [(h if np.array_equal(h[0], h[-1]) else np.vstack([h, h[:1]]), False)]
        c0 = _open_ring(clipper)[0]
        if point_in_rings(float(c0[0]), float(c0[1]), h_closed):
            return [poly]  # clipper inside an existing hole: no-op
    parts = clip_rings_robust(exterior, clipper, "difference")
    out = []
    new_ext = [r for r, is_hole in parts if not is_hole]
    new_holes = [r for r, is_hole in parts if is_hole]
    for ext in new_ext:
        ext_closed = [(ext, False)]
        ext_area = abs(_ring_area(ext))
        kept = [
            h for h in new_holes
            if point_in_rings(float(h[0, 0]), float(h[0, 1]), ext_closed)
        ]
        vanished = False
        for h in holes:
            try:
                frags = clip_rings_robust(h, ext, "intersection")
            except DegenerateGeometry:
                # unresolvable contact: previous rep-point behavior
                frags = (
                    [(h, False)]
                    if point_in_rings(float(h[0, 0]), float(h[0, 1]), ext_closed)
                    else []
                )
            for r, _ in frags:
                if abs(_ring_area(r)) >= ext_area * (1.0 - 1e-12):
                    vanished = True  # hole swallows this piece entirely
                    break
                kept.append(r)
            if vanished:
                break
        if not vanished:
            out.append([ext] + kept)
    return out


def _ring_area(ring: np.ndarray) -> float:
    r = _open_ring(ring)
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def intersection_parts(poly: list[np.ndarray], clipper: np.ndarray):
    """``[exterior, *holes] ∩ clipper-ring`` → list of ``[ext, *holes]``
    parts. The intersection pieces of the exterior keep only the area
    outside the subject's own holes (holes are subtracted from each
    piece). Raises DegenerateGeometry on unresolvable contact."""
    pieces = clip_rings_robust(poly[0], clipper, "intersection")
    parts = [[r] for r, is_hole in pieces if not is_hole]
    for h in poly[1:]:
        nxt = []
        for p in parts:
            nxt.extend(difference_with_holes(p, h))
        parts = nxt
    return parts


def difference_full(poly: list[np.ndarray], water: list[np.ndarray]):
    """``poly − full water polygon``: the water's exterior is subtracted
    and each water HOLE re-adds ``poly ∩ hole`` as land — an island in a
    lake stays land, matching ST_Difference(geom, water) semantics
    (previously only the exterior was subtracted, silently flooding
    islands). Exact when water polygons don't overlap EACH OTHER (a
    water hole overlapping another water's exterior could re-add
    removed land — hydrography layers are disjoint by construction).

    Never raises: a degenerate exterior contact keeps ``poly``
    unclipped; a degenerate hole contact skips that island. Returns
    ``(parts, n_fallbacks)``."""
    try:
        base = difference_with_holes(poly, water[0])
    except DegenerateGeometry:
        return [poly], 1
    n_fb = 0
    for hole in water[1:]:
        try:
            base.extend(intersection_parts(poly, hole))
        except DegenerateGeometry:
            n_fb += 1
    return base, n_fb


def union_parts(
    parts: list[list[np.ndarray]], max_parts: int = 4096, max_fallbacks: int = 64
):
    """ST_Union-style merge of polygon parts (each ``[exterior,
    *holes]``): overlapping hole-free parts are dissolved pairwise into
    one boundary; disjoint or degenerate-contact pairs stay multipart
    (the documented fallback). Returns (merged_parts, n_fallbacks).

    ``max_parts`` guards the O(k²) bbox scan: beyond it (far past any
    real region's part count) parts are assembled without union attempts.
    ``max_fallbacks`` stops attempting after that many degenerate
    contacts — inputs that degenerate (e.g. thousands of identical
    parts) assemble multipart instead of burning k² failed clips.
    """
    if len(parts) > max_parts:
        return parts, 0
    merged: list[list[np.ndarray]] = []
    bboxes: list[tuple] = []
    n_fallbacks = 0

    def bbox(rings):
        e = rings[0]
        return (e[:, 0].min(), e[:, 1].min(), e[:, 0].max(), e[:, 1].max())

    for part in parts:
        cur = part
        cb = bbox(cur)
        i = 0
        while i < len(merged):
            ob = bboxes[i]
            overlaps = not (
                cb[2] < ob[0] or ob[2] < cb[0] or cb[3] < ob[1] or ob[3] < cb[1]
            )
            # only hole-free pairs are unioned; parts with holes stay as-is
            if (
                overlaps and n_fallbacks < max_fallbacks
                and len(cur) == 1 and len(merged[i]) == 1
            ):
                try:
                    res = clip_rings_robust(merged[i][0], cur[0], "union")
                except DegenerateGeometry:
                    n_fallbacks += 1
                    i += 1
                    continue
                if len(res) == 1 and not res[0][1]:
                    cur = [res[0][0]]
                    cb = bbox(cur)
                    merged.pop(i)
                    bboxes.pop(i)
                    i = 0  # the grown part may now reach earlier parts
                    continue
            i += 1
        merged.append(cur)
        bboxes.append(cb)
    return merged, n_fallbacks
