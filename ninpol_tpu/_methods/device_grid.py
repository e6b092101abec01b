"""Device-resident padded grid arrays + stencil bucketing.

The reference walks ragged CSR adjacency per node inside OpenMP loops
(e.g. gls.pyx:161-219).  On TPU every shape must be static, so the grid's
CSR structures are converted once into padded 2D device arrays, and target
nodes are *bucketed* by stencil size (n_elem, n_face) so each bucket
jit-compiles one fixed-shape kernel (SURVEY.md §7 "shape manager").
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .._grid.topology import csr_to_padded


def _round_up(x, m):
    return int(-(-int(x) // m) * m)


class DeviceGrid:
    """Padded device mirrors of the Grid structures used by the methods."""

    def __init__(self, grid):
        self.grid = grid
        self.dim = grid.dim
        self.n_points = grid.n_points
        self.n_elems = grid.n_elems
        self.n_faces = grid.n_faces

        # Host padded adjacency (int32: indices < 2^31).  Widths are
        # rounded up to the same granularity the bucket classes use so a
        # bucket's static E/F never exceeds the array width.
        self.esup2d_h = csr_to_padded(
            grid.esup_ptr, grid.esup,
            _round_up(max(grid.MX_ELEMENTS_PER_POINT, 1), 4)
        ).astype(np.int32)
        self.esup_cnt_h = np.diff(grid.esup_ptr).astype(np.int32)
        self.fsup2d_h = csr_to_padded(
            grid.fsup_ptr, grid.fsup,
            _round_up(max(grid.MX_FACES_PER_POINT, 1), 4)
        ).astype(np.int32)
        self.fsup_cnt_h = np.diff(grid.fsup_ptr).astype(np.int32)
        esuf_w = max(grid.MX_ELEMENTS_PER_FACE, 2)
        self.esuf2d_h = csr_to_padded(
            grid.esuf_ptr, grid.esuf, esuf_w).astype(np.int32)

        dev = jax.devices()[0]
        put = lambda x: jax.device_put(jnp.asarray(x), dev)
        self.point_coords = put(grid.point_coords)
        self.centroids = put(grid.centroids)
        self.normal_faces = put(grid.normal_faces)
        self.faces_centers = put(grid.faces_centers)
        self.boundary_points = put(grid.boundary_points.astype(np.int32))
        self.boundary_faces = put(grid.boundary_faces.astype(np.int32))
        self.esup2d = put(self.esup2d_h)
        self.esup_cnt = put(self.esup_cnt_h)
        self.fsup2d = put(self.fsup2d_h)
        self.fsup_cnt = put(self.fsup_cnt_h)
        self.esuf2d = put(self.esuf2d_h)
        self.inpofa = put(grid.inpofa.astype(np.int32))

    # ------------------------------------------------------------------
    def buckets(self, target_points, active_mask, need_faces=True,
                max_buckets=3, min_bucket=2048, batch_align=256,
                chunk_size=8192, chunk_elems=None):
        """Split (positions into target_points) of *active* nodes into
        fixed-shape work chunks.

        Returns a list of dicts with:
          pos      positions into the target array (np.int64, padded with -1)
          nodes    global node ids (np.int32, padded with 0, masked inactive)
          valid    mask of real entries
          E, F     static per-bucket stencil paddings (multiples of 4)

        Nodes are first classed into stencil-size buckets (quantile cuts on
        n_elem, rounded to multiples of 4 to bound recompilation across
        meshes), then each bucket is sliced into chunks of at most
        ``chunk_size`` nodes so kernel working memory stays bounded
        (a full 1M-cell mesh in one batch would exceed HBM).  All full
        chunks share one compiled shape.
        """
        target_points = np.asarray(target_points)
        pos_all = np.nonzero(active_mask)[0]
        if len(pos_all) == 0:
            return []
        nodes_all = target_points[pos_all]
        ne = self.esup_cnt_h[nodes_all].astype(np.int64)
        nf = (self.fsup_cnt_h[nodes_all].astype(np.int64)
              if need_faces else np.zeros_like(ne))

        qs = [0.5, 0.85, 1.0][-max_buckets:]
        cuts = sorted({_round_up(np.quantile(ne, q), 4) for q in qs})
        assigned = np.full(len(pos_all), -1)
        for ci, cut in enumerate(cuts):
            sel = (assigned < 0) & (ne <= cut)
            assigned[sel] = ci

        out = []
        carry = np.zeros(len(pos_all), dtype=bool)
        for ci, cut in enumerate(cuts):
            sel = (assigned == ci) | carry
            if ci + 1 < len(cuts) and sel.sum() < min_bucket:
                carry = sel
                continue
            carry = np.zeros(len(pos_all), dtype=bool)
            if not sel.any():
                continue
            E = _round_up(ne[sel].max(), 4)
            F = _round_up(nf[sel].max(), 4) if need_faces else 0
            p = pos_all[sel]
            nsel = nodes_all[sel]
            csize = chunk_size
            if chunk_elems is not None:
                # bound kernel working set: B * m * n matrix elements
                # (float64 is software-emulated on TPU and costs several
                # buffers per element, so the budget is deliberately low)
                m_pad = 4 * E + 4 * F
                n_pad = 3 * E + 1
                csize = max(batch_align, min(
                    chunk_size,
                    chunk_elems // (m_pad * n_pad) // batch_align
                    * batch_align))
            for lo in range(0, len(p), csize):
                pc = p[lo:lo + csize]
                nc = nsel[lo:lo + csize]
                B = (csize if len(pc) == csize
                     else _round_up(len(pc), batch_align))
                pos = np.full(B, -1, dtype=np.int64)
                pos[:len(pc)] = pc
                nodes = np.zeros(B, dtype=np.int32)
                nodes[:len(pc)] = nc
                out.append({"pos": pos, "nodes": nodes, "E": E, "F": F,
                            "valid": pos >= 0})
        return out
