"""Degeneracy-robust ring boolean ops by edge-fragment selection.

Greiner–Hormann (clip.py) requires general position: shared vertices,
collinear edges, and boundary touches — ubiquitous when OSM polygons
share admin boundaries — raise DegenerateGeometry there, previously
falling back to seeded micro-perturbation. This module computes the
same boolean ops WITHOUT moving any vertex:

  1. split every edge of each ring at its intersections with the other
     ring's edges (proper crossings, endpoint touches, and collinear
     overlaps — split points are exact copies of existing vertices
     whenever the contact is at a vertex, so shared boundaries stay
     byte-identical);
  2. classify each fragment by the even-odd ray cast of its midpoint
     against the other ring (geometry/pip.py — shares no code with the
     clipper), with ON-boundary fragments matched to the other ring's
     fragment over the same segment and resolved by direction;
  3. select fragments by the standard rules (interiors left of a CCW
     boundary) and stitch them into closed rings, taking the most
     counter-clockwise turn at multi-way junctions;
  4. ring orientation of the output classifies exterior (CCW) vs hole
     (CW) — a clipper strictly inside the subject comes out CW
     automatically under ``difference``.

Selection rules (A = subject, B = clipper, both normalized CCW):
  intersection: A-frags inside B ∪ B-frags inside A ∪ shared same-dir (once)
  union:        A-frags outside B ∪ B-frags outside A ∪ shared same-dir (once)
  difference:   A-frags outside B ∪ REVERSED B-frags inside A
                ∪ shared opposite-dir (A's copy)

Containment cases need no special path: with no crossings the fragments
are whole edges and the midpoint classification already produces the
keep/drop/hole answers.

Used by clip.clip_rings_robust as the first fallback when plain
Greiner–Hormann detects degeneracy; the perturbation retry remains only
as a last resort (and counts fallbacks as before).
"""

from __future__ import annotations

import numpy as np

from .pip import point_in_rings


class StitchError(ValueError):
    """Selected fragments did not close into rings."""


def _open(ring: np.ndarray) -> np.ndarray:
    r = np.asarray(ring, dtype=np.float64)
    if len(r) > 1 and np.array_equal(r[0], r[-1]):
        r = r[:-1]
    return r


def _signed_area(r: np.ndarray) -> float:
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def _ccw(r: np.ndarray) -> np.ndarray:
    return r if _signed_area(r) >= 0 else r[::-1]


def _edge_splits(A: np.ndarray, B: np.ndarray):
    """For each edge of A: sorted split parameters t → exact point.

    Returns ``splits[i] = {t: (x, y)}`` for A's edge i. Intersection
    points at a vertex of either ring are that vertex's exact floats;
    interior proper crossings use the parametric point computed ONCE
    per (i, j) pair by the caller's symmetric invocation (same formula,
    same operand order → identical doubles on both rings)."""
    n, m = len(A), len(B)
    splits: list[dict] = [dict() for _ in range(n)]
    for i in range(n):
        p, p2 = A[i], A[(i + 1) % n]
        d = p2 - p
        for j in range(m):
            q, q2 = B[j], B[(j + 1) % m]
            e = q2 - q
            denom = d[0] * e[1] - d[1] * e[0]
            c1 = e[0] * (p[1] - q[1]) - e[1] * (p[0] - q[0])
            c2 = d[0] * (p[1] - q[1]) - d[1] * (p[0] - q[0])
            if denom == 0.0:
                if c1 != 0.0 or c2 != 0.0:
                    continue  # parallel, not collinear
                # collinear: project B's endpoints onto A's edge
                dd = float(d[0] * d[0] + d[1] * d[1])
                if dd == 0.0:
                    continue
                for qq in (q, q2):
                    t = float((qq[0] - p[0]) * d[0] + (qq[1] - p[1]) * d[1]) / dd
                    if 0.0 < t < 1.0:
                        splits[i][t] = (float(qq[0]), float(qq[1]))
                continue
            t = c1 / denom
            u = c2 / denom
            if not (0.0 <= t <= 1.0 and 0.0 <= u <= 1.0):
                continue
            if 0.0 < t < 1.0:
                if u == 0.0:
                    pt = (float(q[0]), float(q[1]))
                elif u == 1.0:
                    pt = (float(q2[0]), float(q2[1]))
                else:
                    # parametric point with a CANONICAL anchor (the
                    # lexicographically smaller edge) so the symmetric
                    # (B, A) call computes bit-identical doubles — the
                    # stitch matches fragment endpoints by exact float
                    # equality
                    ka = (float(p[0]), float(p[1]), float(p2[0]), float(p2[1]))
                    kb = (float(q[0]), float(q[1]), float(q2[0]), float(q2[1]))
                    if ka <= kb:
                        pt = (float(p[0] + t * d[0]), float(p[1] + t * d[1]))
                    else:
                        pt = (float(q[0] + u * e[0]), float(q[1] + u * e[1]))
                splits[i][t] = pt
    return splits


def _fragments(R: np.ndarray, splits) -> list[tuple[tuple, tuple]]:
    frags = []
    n = len(R)
    for i in range(n):
        a = (float(R[i][0]), float(R[i][1]))
        b = (float(R[(i + 1) % n][0]), float(R[(i + 1) % n][1]))
        pts = [a] + [p for _, p in sorted(splits[i].items())] + [b]
        for k in range(len(pts) - 1):
            if pts[k] != pts[k + 1]:
                frags.append((pts[k], pts[k + 1]))
    return frags


def _closed(r: np.ndarray) -> list:
    return [(np.vstack([r, r[:1]]), False)]


def clip_rings_exact(subject: np.ndarray, clipper: np.ndarray, op: str):
    """Boolean op between two simple rings, degeneracy-robust.

    Same contract as clip.clip_rings: returns ``[(closed_ring,
    is_hole), ...]``. Never perturbs input coordinates; raises
    StitchError if the selected fragments fail to close (caller falls
    back)."""
    if op not in ("intersection", "union", "difference"):
        raise ValueError(f"unknown op {op!r}")
    A = _ccw(_open(subject))
    B = _ccw(_open(clipper))
    a_frags = _fragments(A, _edge_splits(A, B))
    b_frags = _fragments(B, _edge_splits(B, A))

    b_dir = {}
    for s, e in b_frags:
        b_dir[(s, e)] = True
    a_dir = {}
    for s, e in a_frags:
        a_dir[(s, e)] = True

    a_closed = _closed(A)
    b_closed = _closed(B)

    def side(frag, other_closed):
        mx = (frag[0][0] + frag[1][0]) * 0.5
        my = (frag[0][1] + frag[1][1]) * 0.5
        return point_in_rings(mx, my, other_closed)

    selected: list[tuple[tuple, tuple]] = []
    for s, e in a_frags:
        if (s, e) in b_dir:  # shared, same direction
            if op in ("intersection", "union"):
                selected.append((s, e))
            continue
        if (e, s) in b_dir:  # shared, opposite direction
            if op == "difference":
                selected.append((s, e))
            continue
        inside = side((s, e), b_closed)
        if op == "intersection" and inside:
            selected.append((s, e))
        elif op in ("union", "difference") and not inside:
            selected.append((s, e))
    for s, e in b_frags:
        if (s, e) in a_dir or (e, s) in a_dir:
            continue  # handled from A's side
        inside = side((s, e), a_closed)
        if op == "intersection" and inside:
            selected.append((s, e))
        elif op == "union" and not inside:
            selected.append((s, e))
        elif op == "difference" and inside:
            selected.append((e, s))  # reversed: becomes hole boundary

    if not selected:
        return []
    rings = _stitch(selected)
    return [
        (np.vstack([r, r[:1]]), _signed_area(r) < 0)
        for r in rings
        if len(r) >= 3 and _signed_area(r) != 0.0
    ]


def _stitch(edges: list[tuple[tuple, tuple]]) -> list[np.ndarray]:
    """Directed fragments → closed rings. At a junction with several
    outgoing fragments, take the most counter-clockwise turn relative
    to the incoming direction (keeps regions simply-stitched at pinch
    vertices)."""
    out_map: dict[tuple, list[int]] = {}
    for idx, (s, _e) in enumerate(edges):
        out_map.setdefault(s, []).append(idx)
    used = [False] * len(edges)
    rings = []
    for start_idx in range(len(edges)):
        if used[start_idx]:
            continue
        path = []
        idx = start_idx
        first_pt = edges[idx][0]
        guard = 0
        while True:
            guard += 1
            if guard > len(edges) + 1:
                raise StitchError("stitch walk did not terminate")
            used[idx] = True
            s, e = edges[idx]
            path.append(s)
            if e == first_pt:
                break
            cands = [c for c in out_map.get(e, []) if not used[c]]
            if not cands:
                raise StitchError(f"open chain at {e}")
            if len(cands) == 1:
                idx = cands[0]
            else:
                # most counter-clockwise turn from incoming direction
                ix, iy = e[0] - s[0], e[1] - s[1]

                def turn(c):
                    (_, _), (nx, ny) = edges[c][0], edges[c][1]
                    ox, oy = nx - e[0], ny - e[1]
                    cross = ix * oy - iy * ox
                    dot = ix * ox + iy * oy
                    import math

                    return math.atan2(cross, dot)

                idx = max(cands, key=turn)
        rings.append(np.array(path, dtype=np.float64))
    return rings
