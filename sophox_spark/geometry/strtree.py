"""STR-packed R-tree (sort-tile-recursive) over bboxes, numpy only.

The broadcast polygon-side candidate index of the north_star
("ray-casting over STRtree-packed broadcast polygon partitions"): built
once per executor from the broadcast polygon batch, probed with whole
Arrow batches of points. Plays the role PostGIS' GiST index plays in
the reference (/root/reference/osm-to-pgsql/create_indexes.sql), but is
immutable + bulk-loaded, which is exactly right for a broadcast dim.
"""

from __future__ import annotations

import numpy as np

NODE_CAP = 16


class STRtree:
    def __init__(self, bboxes: np.ndarray, node_cap: int = NODE_CAP):
        """bboxes: (n, 4) [xmin, ymin, xmax, ymax]."""
        self.item_bbox = np.asarray(bboxes, dtype=np.float64)
        n = len(self.item_bbox)
        self.node_cap = node_cap
        # order items by STR packing; levels[0] are leaves over self.order
        self.order = self._str_order(self.item_bbox) if n else np.empty(0, np.int64)
        self.levels: list[tuple[np.ndarray, np.ndarray]] = []  # (bbox, child_start)
        if n == 0:
            return
        cur_bbox = self.item_bbox[self.order]
        while True:
            k = len(cur_bbox)
            n_nodes = (k + node_cap - 1) // node_cap
            starts = np.arange(n_nodes, dtype=np.int64) * node_cap
            nb = np.empty((n_nodes, 4))
            for i in range(n_nodes):
                seg = cur_bbox[starts[i] : starts[i] + node_cap]
                nb[i, 0] = seg[:, 0].min()
                nb[i, 1] = seg[:, 1].min()
                nb[i, 2] = seg[:, 2].max()
                nb[i, 3] = seg[:, 3].max()
            self.levels.append((nb, starts))
            if n_nodes == 1:
                break
            cur_bbox = nb

    def _str_order(self, bb: np.ndarray) -> np.ndarray:
        n = len(bb)
        cx = (bb[:, 0] + bb[:, 2]) * 0.5
        cy = (bb[:, 1] + bb[:, 3]) * 0.5
        leaves = (n + self.node_cap - 1) // self.node_cap
        s = int(np.ceil(np.sqrt(leaves)))
        by_x = np.argsort(cx, kind="stable")
        slab = s * self.node_cap
        order_parts = []
        for i in range(0, n, slab):
            part = by_x[i : i + slab]
            order_parts.append(part[np.argsort(cy[part], kind="stable")])
        return np.concatenate(order_parts)

    def query_points(self, px, py) -> tuple[np.ndarray, np.ndarray]:
        """Candidate pairs for point containment: returns (point_idx,
        item_idx) where the point lies inside the item bbox."""
        px = np.asarray(px, np.float64)
        py = np.asarray(py, np.float64)
        if not self.levels or px.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        q = np.arange(px.size, dtype=np.int64)
        nodes = np.zeros(px.size, dtype=np.int64)  # root has 1 node
        for li in range(len(self.levels) - 1, -1, -1):
            nb, starts = self.levels[li]
            bb = nb[nodes]
            ok = (
                (px[q] >= bb[:, 0]) & (px[q] <= bb[:, 2])
                & (py[q] >= bb[:, 1]) & (py[q] <= bb[:, 3])
            )
            q, nodes = q[ok], nodes[ok]
            if q.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            lower = len(self.order) if li == 0 else len(self.levels[li - 1][0])
            first = starts[nodes]
            cnt = np.minimum(first + self.node_cap, lower) - first
            q = np.repeat(q, cnt)
            tot = int(cnt.sum())
            loc = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt
            )
            nodes = np.repeat(first, cnt) + loc
        # nodes now index into self.order (leaf slots)
        items = self.order[nodes]
        bb = self.item_bbox[items]
        ok = (
            (px[q] >= bb[:, 0]) & (px[q] <= bb[:, 2])
            & (py[q] >= bb[:, 1]) & (py[q] <= bb[:, 3])
        )
        return q[ok], items[ok]

    def query_bbox(self, qb: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Candidate pairs for bbox intersection: (query_idx, item_idx)."""
        qb = np.asarray(qb, np.float64)
        if not self.levels or len(qb) == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        q = np.arange(len(qb), dtype=np.int64)
        nodes = np.zeros(len(qb), dtype=np.int64)

        def inter(a, b):
            return (
                (a[:, 0] <= b[:, 2]) & (a[:, 2] >= b[:, 0])
                & (a[:, 1] <= b[:, 3]) & (a[:, 3] >= b[:, 1])
            )

        for li in range(len(self.levels) - 1, -1, -1):
            nb, starts = self.levels[li]
            ok = inter(qb[q], nb[nodes])
            q, nodes = q[ok], nodes[ok]
            if q.size == 0:
                return np.empty(0, np.int64), np.empty(0, np.int64)
            lower = len(self.order) if li == 0 else len(self.levels[li - 1][0])
            first = starts[nodes]
            cnt = np.minimum(first + self.node_cap, lower) - first
            q = np.repeat(q, cnt)
            tot = int(cnt.sum())
            loc = np.arange(tot, dtype=np.int64) - np.repeat(
                np.concatenate(([0], np.cumsum(cnt)[:-1])), cnt
            )
            nodes = np.repeat(first, cnt) + loc
        items = self.order[nodes]
        ok = inter(qb[q], self.item_bbox[items])
        return q[ok], items[ok]
