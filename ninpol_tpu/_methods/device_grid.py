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


# Canonical stencil-size ladder shared by ALL meshes: every bucket's
# static (E, F) snaps UP to a ladder value, so different meshes of the
# same family hit the SAME compiled kernel shapes.  Free-form quantile
# cuts (round 2) gave each mesh its own shapes — with executable
# load/compile costing ~minutes per shape through this environment's
# remote helper, the shape count dominated process warm-start time.
_SIZE_LADDER = (4, 8, 12, 16, 20, 24, 28, 32, 36, 40, 48, 56, 64, 80, 96,
                112, 128, 160, 192, 224, 256)


def _ladder_up(x):
    x = int(x)
    for v in _SIZE_LADDER:
        if v >= x:
            return v
    return _round_up(x, 64)


def _pow2_down(x, lo):
    b = int(lo)
    while b * 2 <= x:
        b *= 2
    return b


class DeviceGrid:
    """Padded device mirrors of the Grid structures used by the methods.

    With ``mesh`` (a jax.sharding.Mesh), every array is REPLICATED over
    the mesh's devices and the method drivers route kernels through
    jax.shard_map with the node batch sharded over the mesh axis — the
    multi-chip scaling path (per-node weights are node-local, so stencil
    gathers stay device-local and no collectives are needed; see
    parallel/sharding.py for the geometry-sharded memory-scaling
    variant)."""

    def __init__(self, grid, mesh=None):
        self.grid = grid
        self.mesh = mesh
        self.dim = grid.dim
        self.n_points = grid.n_points
        self.n_elems = grid.n_elems
        self.n_faces = grid.n_faces

        # Host padded adjacency (int32: indices < 2^31).  Widths are
        # rounded up to the same granularity the bucket classes use so a
        # bucket's static E/F never exceeds the array width.
        self.esup2d_h = csr_to_padded(
            grid.esup_ptr, grid.esup,
            _ladder_up(max(grid.MX_ELEMENTS_PER_POINT, 1))
        ).astype(np.int32)
        self.esup_cnt_h = np.diff(grid.esup_ptr).astype(np.int32)
        self.fsup2d_h = csr_to_padded(
            grid.fsup_ptr, grid.fsup,
            _ladder_up(max(grid.MX_FACES_PER_POINT, 1))
        ).astype(np.int32)
        self.fsup_cnt_h = np.diff(grid.fsup_ptr).astype(np.int32)
        esuf_w = max(grid.MX_ELEMENTS_PER_FACE, 2)
        self.esuf2d_h = csr_to_padded(
            grid.esuf_ptr, grid.esuf, esuf_w).astype(np.int32)

        if mesh is None:
            target = jax.devices()[0]
        else:
            from jax.sharding import NamedSharding, PartitionSpec
            target = NamedSharding(mesh, PartitionSpec())
        put = lambda x: jax.device_put(jnp.asarray(x), target)

        def put_pair(a):
            """Upload a float64 geometry array as an exact hi/lo float32
            pair (same bytes on the wire; hi + lo reconstructs the f64
            bit-exactly).  The GLS fast path consumes the pairs directly
            (df32 prologue); f64 consumers use the lazy properties."""
            a = np.asarray(a, np.float64)
            h = a.astype(np.float32)
            return put(h), put((a - h.astype(np.float64))
                               .astype(np.float32))

        self.pc_h, self.pc_l = put_pair(grid.point_coords)
        self.cen_h, self.cen_l = put_pair(grid.centroids)
        self.nrm_h, self.nrm_l = put_pair(grid.normal_faces)
        self.fcc_h, self.fcc_l = put_pair(grid.faces_centers)
        self._f64_cache = {}
        self._plan_cache = {}
        # PACKED gather tables: XLA TPU gathers cost ~8 cycles PER ROW
        # regardless of width (measured: 17 narrow stencil gathers ≈ the
        # entire fused solve kernel), so per-point/per-cell/per-face data
        # is packed into one wide row per entity and gathered ONCE.
        self.point_pack = jnp.concatenate([self.pc_h, self.pc_l], axis=1)
        self.cell_pack = jnp.concatenate([self.cen_h, self.cen_l], axis=1)
        # int face row: the esuf pair only (boundary flag = esuf[1] < 0;
        # inpofa stays host-side — the per-face Neumann mean that used
        # to need it on device is precomputed on the host, gls.py).
        # Keeping it to 2 columns saves ~75 MB of upload at 2M-cell
        # scale through this environment's ~25-60 MB/s relay.
        self.face_ipack = put(self.esuf2d_h[:, :2])
        self.esup2d = put(self.esup2d_h)
        self.esup_cnt = put(self.esup_cnt_h)
        self.fsup2d = put(self.fsup2d_h)
        self.fsup_cnt = put(self.fsup_cnt_h)
        # esuf2d/inpofa/boundary flags live only inside face_ipack (and
        # as host arrays on the Grid) — separate device copies would add
        # seconds of upload through this environment's relay.

    # float64 device views reconstructed lazily from the pairs (exact:
    # hi + lo is the original value) — used by IDW/LS and the legacy
    # solver paths; the GLS fast path reads the pairs directly.
    def _f64(self, name, h, l):
        if name not in self._f64_cache:
            self._f64_cache[name] = (h.astype(jnp.float64)
                                     + l.astype(jnp.float64))
        return self._f64_cache[name]

    @property
    def point_coords(self):
        return self._f64("pc", self.pc_h, self.pc_l)

    @property
    def centroids(self):
        return self._f64("cen", self.cen_h, self.cen_l)

    @property
    def normal_faces(self):
        return self._f64("nrm", self.nrm_h, self.nrm_l)

    @property
    def faces_centers(self):
        return self._f64("fcc", self.fcc_h, self.fcc_l)

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

        Nodes are first classed into stencil-size buckets (quantile cuts
        on n_elem, snapped UP to the canonical _SIZE_LADDER so all
        meshes share the same compiled shapes), then each bucket is
        sliced into power-of-two chunks of at most ``chunk_size`` nodes
        so kernel working memory stays bounded (a full 1M-cell mesh in
        one batch would exceed HBM).  All full chunks share one compiled
        shape; tails pad to the next power of two.
        """
        target_points = np.asarray(target_points)
        # Content-keyed plan cache: repeat prepares over the same target
        # set (bench repeats; different variables on one mesh) reuse the
        # plan AND its device-resident nodes/valid arrays — zero
        # host->device uploads on a hit (each transfer costs ~70 ms of
        # relay latency here).  NOTE: callers may stamp extra metadata
        # (e.g. with_neumann) onto the returned dicts; for identical
        # inputs those stamps are identical, so sharing is safe.
        import hashlib
        ck = (hashlib.sha1(target_points.tobytes()).hexdigest(),
              hashlib.sha1(np.ascontiguousarray(
                  active_mask).tobytes()).hexdigest(),
              need_faces, max_buckets, min_bucket, batch_align,
              chunk_size, chunk_elems)
        hit = self._plan_cache.get(ck)
        if hit is not None:
            return hit
        pos_all = np.nonzero(active_mask)[0]
        if len(pos_all) == 0:
            if len(self._plan_cache) >= 8:
                self._plan_cache.pop(next(iter(self._plan_cache)))
            self._plan_cache[ck] = []
            return []
        nodes_all = target_points[pos_all]
        ne = self.esup_cnt_h[nodes_all].astype(np.int64)
        nf = (self.fsup_cnt_h[nodes_all].astype(np.int64)
              if need_faces else np.zeros_like(ne))

        # batch sizes are batch_align * 2^k (multichip passes
        # 128 * n_devices so every chunk shards evenly into 128-node
        # Pallas tiles per device)
        batch_align = max(int(batch_align), 256)
        qs = [0.5, 0.85, 1.0][-max_buckets:]
        cuts = sorted({_ladder_up(np.quantile(ne, q)) for q in qs})
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
            E = _ladder_up(ne[sel].max())
            F = _ladder_up(nf[sel].max()) if need_faces else 0
            p = pos_all[sel]
            nsel = nodes_all[sel]
            csize = _pow2_down(chunk_size, batch_align)
            if chunk_elems is not None:
                # bound kernel working set: B * m * n matrix elements
                m_pad = 4 * E + 4 * F
                n_pad = 3 * E + 1
                csize = max(batch_align, min(
                    csize,
                    _pow2_down(max(chunk_elems // (m_pad * n_pad), 1),
                               batch_align)))
            # Full chunks share one compiled shape.  The tail becomes
            # quantum chunks of csize/4 plus ONE final chunk snapped UP
            # to the geometric ladder csize/4^k (floored at
            # batch_align), so a bucket class touches at most THREE
            # distinct (E, F, B) programs per run.  Every distinct
            # program costs ~10 s of load through the remote helper
            # even fully cached (the round-2 free-form power-of-two
            # tails put warm start at ~10 minutes), while the final
            # chunk pads by at most 4x its real nodes — a single fixed
            # quantum instead padded tiny CPU-test meshes 27 -> 8192
            # nodes (70 s/call, suite-breaking).
            n_full = len(p) // csize
            plan = [(csize, csize)] * n_full
            rem = len(p) - n_full * csize
            q = max(batch_align, csize // 4)
            while rem >= q:
                plan.append((q, q))
                rem -= q
            if rem > 0:
                last = q
                while last // 4 >= max(batch_align, rem):
                    last //= 4
                plan.append((max(batch_align, last), rem))
            lo = 0
            for B, take in plan:
                pc = p[lo:lo + take]
                nc = nsel[lo:lo + take]
                pos = np.full(B, -1, dtype=np.int64)
                pos[:take] = pc
                nodes = np.zeros(B, dtype=np.int32)
                nodes[:take] = nc
                out.append({"pos": pos, "nodes": nodes, "E": E, "F": F,
                            "valid": pos >= 0})
                lo += take
        if len(self._plan_cache) >= 8:
            self._plan_cache.pop(next(iter(self._plan_cache)))
        self._plan_cache[ck] = out
        return out


def bucket_dev(b):
    """Device-resident (nodes, valid) for a bucket, created lazily and
    cached on the bucket dict (which rides the content-keyed plan cache,
    so repeat prepares re-use the device arrays — each host->device
    transfer costs ~70 ms of relay latency here).  Lazy because
    scan-stacked chunk groups (methods/gls.py) consume their own stacked
    uploads and never touch the per-chunk arrays."""
    if "nodes_d" not in b:
        b["nodes_d"] = jnp.asarray(b["nodes"])
        b["valid_d"] = jnp.asarray(b["valid"])
    return b["nodes_d"], b["valid_d"]


from functools import partial as _partial


def _pad_cols_j(w, ncols_out, extra=0):
    ncols = min(w.shape[1], ncols_out)
    return jnp.concatenate(
        [w[:, :ncols],
         jnp.zeros((w.shape[0], ncols_out - ncols + extra), w.dtype)],
        axis=1)


@_partial(jax.jit, static_argnames=("n_target", "ncols_out"))
def _deliver_device_j(rows_list, pos_flat, *, n_target, ncols_out):
    """One program: pad + scatter all bucket rows into the consolidated
    [weights | 0] array (eager per-bucket pad/concat/scatter ops each
    cost ~10 s of executable load through this environment's helper).
    pos_flat carries ALL buckets' positions in one array (one upload,
    not one ~70 ms transfer per bucket); slices are static."""
    wdev = jnp.zeros((n_target, ncols_out + 1), jnp.float64)
    off = 0
    for w in rows_list:
        pos = pos_flat[off:off + w.shape[0]]
        off += w.shape[0]
        wdev = wdev.at[pos].set(_pad_cols_j(w, ncols_out, extra=1),
                                mode="drop")
    return wdev


@_partial(jax.jit, static_argnames=("delivery_f32", "ncols_out"))
def _deliver_concat_j(rows_list, *, delivery_f32, ncols_out):
    rows = [_pad_cols_j(w, ncols_out) for w in rows_list]
    cat = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    return cat.astype(jnp.float32) if delivery_f32 else cat


def group_plan(items):
    """Fetch-group composition for host delivery (shared by the real
    fetch loops and the shape-only executable preloads)."""
    if not items:
        return []
    n_groups = min(4, len(items))
    per = -(-len(items) // n_groups)
    return [items[i:i + per] for i in range(0, len(items), per)]


def fetch_groups_overlapped(cats, groups, write_group):
    """Fetch group k+1's device->host transfer on a helper thread (the
    relay fetch is IO-bound and releases the GIL) while the main thread
    runs ``write_group(groups[k], host_k)`` — the host row scatter would
    otherwise serialize after the last fetch.  Exactly one fetch is in
    flight at a time (concurrent fetches stall on this relay)."""
    if not groups:
        return
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=1) as tpe:
        fut = tpe.submit(np.asarray, cats[0])
        for gi, grp in enumerate(groups):
            host = fut.result()
            if gi + 1 < len(groups):
                fut = tpe.submit(np.asarray, cats[gi + 1])
            write_group(grp, host)


# Shape signatures whose executables were already pulled through the
# remote helper this process — the dummy preload executions are pure
# load-warming, so repeat prepares skip them (they cost a dropped
# full-size consolidation execution plus transient result-scale HBM).
_preloaded_sigs = set()


def dispatch_with_preload(buckets, run, n_target, ncols_out, device_out,
                          delivery_f32):
    """Dispatch ``run(bucket)`` for every bucket, first pulling each
    DISTINCT compiled program through the remote helper from a thread
    pool: even fully cached, an executable load blocks the dispatching
    thread ~10 s through this environment's helper, and loads overlap
    across threads.  The solve programs preload by RUNNING the first
    bucket of each (E, B) class (results kept — no work runs twice);
    the delivery consolidation preloads with same-shape device-resident
    zero inputs (junk results dropped; jnp.zeros allocates on device),
    once per shape signature per process."""
    preloaded = {}
    if buckets:
        first_of = {}
        for b in buckets:
            first_of.setdefault((b["E"], len(b["pos"])), b)
        # program identity depends on the FULL bucket shape sequence
        # (group composition), not just the distinct classes
        sig = ("deliver", tuple((b["E"], len(b["pos"])) for b in buckets),
               n_target, ncols_out, device_out, bool(delivery_f32))

        def dummy_rows(bs):
            return tuple(jnp.zeros((len(b["pos"]), b["E"]), jnp.float64)
                         for b in bs)

        def preload_delivery():
            if device_out:
                pos = jnp.zeros((sum(len(b["pos"]) for b in buckets),),
                                jnp.int64)
                _deliver_device_j(dummy_rows(buckets), pos,
                                  n_target=n_target, ncols_out=ncols_out)
            else:
                for grp in group_plan(buckets):
                    _deliver_concat_j(dummy_rows(grp),
                                      delivery_f32=bool(delivery_f32),
                                      ncols_out=ncols_out)

        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(min(8, len(first_of) + 1)) as ex:
            futs = {ex.submit(run, b): id(b) for b in first_of.values()}
            job = None
            if sig not in _preloaded_sigs:
                _preloaded_sigs.add(sig)
                job = ex.submit(preload_delivery)
            for f in futs:
                preloaded[futs[f]] = f.result()
            if job is not None:
                job.result()
    out = []
    for b in buckets:
        w = preloaded.pop(id(b), None)
        out.append((b, w if w is not None else run(b)))
    return out


def deliver_weights(launched, weights, neumann_ws, n_target, device_out,
                    delivery_f32=False):
    """Shared IDW/LS result delivery.

    launched: [(bucket, (B, ncols) device rows)].
    device_out=True returns a consolidated (n_target, ncols+1) float64
    device array [weights | 0] (the neumann column is zero — IDW/LS
    never write it, idw.pyx/ls.pyx) for on-device consumers, skipping
    the host relay entirely.  delivery_f32=True fetches the rows as
    float32 (half the relay bytes; ~1e-7 relative rounding — documented
    non-parity knob).  Bucket rows may be narrower than the output:
    padding happens inside the jitted consolidation."""
    ncols_out = weights.shape[1]
    if device_out:
        if not launched:
            return jnp.zeros((n_target, ncols_out + 1), jnp.float64)
        pos_flat = jnp.asarray(np.concatenate(
            [np.where(b["pos"] >= 0, b["pos"], n_target)
             for b, _ in launched]))
        return _deliver_device_j(tuple(w for _, w in launched),
                                 pos_flat, n_target=n_target,
                                 ncols_out=ncols_out)
    if not launched:
        return weights, neumann_ws
    # A few compact fetch groups (amortizes the ~70 ms per-transfer
    # relay latency); group k+1's transfer runs on a helper thread (the
    # relay fetch is IO-bound and releases the GIL) while the main
    # thread scatters group k's rows into `weights`.
    groups = group_plan(launched)
    cats = [_deliver_concat_j(tuple(w for _, w in grp),
                              delivery_f32=bool(delivery_f32),
                              ncols_out=ncols_out) for grp in groups]

    def write_group(grp, host):
        lo = 0
        for bucket, w in grp:
            nb = w.shape[0]
            sel = bucket["valid"]
            pos = bucket["pos"][sel]
            weights[pos, :] = host[lo:lo + nb][sel]
            lo += nb

    fetch_groups_overlapped(cats, groups, write_group)
    return weights, neumann_ws
