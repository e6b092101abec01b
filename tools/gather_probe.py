"""Gather-strategy shootout for the fused-kernel prologue.

tools/glue_probe.py showed the packed gathers cost 31.96 ms/chunk
(1951 ns/node) at 1.9M-tet scale — MORE than the 28.6 ms fused solve
kernel — vs ~18 ns/row on small meshes (the "8 cycles/row" lore).  This
probe isolates WHY and tests the candidate fixes on one real bucket
(E=24, F=36, B=16384 at n=68):

  face_base    the production face gather (590k rows x 30 f32)
  face32       same rows padded to 32 f32 = 128 B (alignment test)
  face_sorted  same row COUNT, indices sorted (locality test)
  face_span    same row count, indices % 2^16 (small-SPAN test: does
               cost follow table size or index spread?)
  face_2lvl    two-level: gather U unique rows, then re-gather the
               (B,F) layout from the compact table (row-count test)
  cell_base    the production cell gather (393k rows x 6 f32)
  noderows     esup/fsup/cnt/point per-node rows (5 x 16k rows)

RESULTS (v5e via axon, 2026-08-19, 1.9M tets, E=24 F=36 B=16384,
face refs 589824 / 246352 unique, span [1, 3490180] of 3800928):

  face_base      25.74 ms/chunk  ( 1571 ns/node,  43.6 ns/row)
  face32         25.49 ms/chunk  ( 1556 ns/node,  43.2 ns/row)
  face_sorted    38.35 ms/chunk  ( 2340 ns/node,  65.0 ns/row)
  face_span      25.33 ms/chunk  ( 1546 ns/node,  42.9 ns/row)
  face_2lvl      21.02 ms/chunk  ( 1283 ns/node,  35.6 ns/row)
  cell_base       4.26 ms/chunk  (  260 ns/node,  10.8 ns/row)
  noderows        5.64 ms/chunk  (  344 ns/node,  68.9 ns/row)

Reading: 128-byte alignment, index SPAN, and sorting do NOT help
(sorting actively hurts); the two-level form wins 18% overall and its
second gather (same 590k rows, but from the 30 MB compact table) runs
at ~17.5 ns/row — the small-mesh floor.  Gather cost tracks the
PHYSICAL TABLE SIZE (456 MB face table -> 43.6 ns/row), not locality.
There is no in-solve gather form anywhere near the kernel's speed =>
the production fix is to hoist the gather OUT of the timed solve
entirely: the gather output is a pure function of (grid, variable,
bucket plan), exactly the contract of gls._face_cache — pre-gather the
tiled kernel inputs once at prepare() and cache them on the plan
(gls.py tile cache).

Usage: python tools/gather_probe.py [n]   (default 68 -> 1.9M tets)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    return np.asarray(x)


def timeit(fn, k=8):
    sync(fn())  # compile + first run
    t0 = time.perf_counter()
    r = None
    for _ in range(k):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / k


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_problem

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    interp, bt = build_problem(n)
    grid = interp.grid
    tp = np.arange(grid.n_points)
    print(f"# mesh {grid.n_elems} cells {grid.n_points} pts "
          f"{grid.n_faces} faces, build {bt:.1f}s", flush=True)

    wdev = interp.prepare_interpolator("gls", "u", tp, device_out=True)
    _ = sync(wdev[-1:, -1:])

    dg = interp.device_grid
    act = ~grid.boundary_points.astype(bool)
    bucket = max((b for b in dg.buckets(tp, act, chunk_size=16384,
                                        chunk_elems=interp.gls.chunk_elems)),
                 key=lambda b: len(b["pos"]))
    E, F, B = bucket["E"], bucket["F"], len(bucket["pos"])
    nodes_h = bucket["nodes"]
    print(f"# bucket E={E} F={F} B={B}", flush=True)

    face_pack = interp.gls._face_cache[0]
    W = face_pack.shape[1]
    nodes_d = jnp.asarray(nodes_h)

    # host-side index construction (mirrors the prologue)
    SF_h = dg.fsup2d_h[nodes_h, :F]
    SF_h = np.where(SF_h >= 0, SF_h, 0).astype(np.int32)
    KS_h = dg.esup2d_h[nodes_h, :E]
    KS_h = np.where(KS_h >= 0, KS_h, 0).astype(np.int32)
    uniq, inv = np.unique(SF_h, return_inverse=True)
    inv = inv.reshape(SF_h.shape).astype(np.int32)
    print(f"# face refs {SF_h.size} unique {len(uniq)} "
          f"(dup x{SF_h.size / len(uniq):.2f}); span "
          f"[{SF_h.min()}, {SF_h.max()}] of {grid.n_faces}", flush=True)

    SF = jnp.asarray(SF_h)
    KS = jnp.asarray(KS_h)
    SF_sorted = jnp.asarray(np.sort(SF_h.ravel()).reshape(SF_h.shape))
    SF_span = jnp.asarray((SF_h % 65536).astype(np.int32))
    uniq_d = jnp.asarray(uniq)
    inv_d = jnp.asarray(inv)
    # 32-col aligned copy of the face table
    fp32_h = np.zeros((face_pack.shape[0], 32), np.float32)
    fp32_h[:, :W] = np.asarray(face_pack)
    fp32 = jnp.asarray(fp32_h)

    jit = jax.jit

    @jit
    def face_base(fp, idx):
        return fp[idx].sum(dtype=jnp.float32)

    @jit
    def face_2lvl(fp, u, iv):
        compact = fp[u]
        return compact[iv].sum(dtype=jnp.float32)

    @jit
    def cell_base(cp, idx):
        return cp[idx].sum(dtype=jnp.float32)

    @jit
    def noderows(e2, ec, f2, fc, pp, nd):
        return (e2[nd, :E].sum() + ec[nd].sum() + f2[nd, :F].sum()
                + fc[nd].sum()).astype(jnp.float32) + pp[nd].sum(
                    dtype=jnp.float32)

    nref_f = SF_h.size
    nref_c = KS_h.size

    def rep(name, dt, nrows):
        print(f"# {name:12s} {dt*1e3:7.2f} ms/chunk  "
              f"({dt/B*1e9:5.0f} ns/node, {dt/nrows*1e9:5.1f} ns/row)",
              flush=True)

    rep("face_base", timeit(lambda: face_base(face_pack, SF)), nref_f)
    rep("face32", timeit(lambda: face_base(fp32, SF)), nref_f)
    rep("face_sorted", timeit(lambda: face_base(face_pack, SF_sorted)),
        nref_f)
    rep("face_span", timeit(lambda: face_base(face_pack, SF_span)), nref_f)
    rep("face_2lvl", timeit(lambda: face_2lvl(face_pack, uniq_d, inv_d)),
        nref_f)
    rep("cell_base", timeit(lambda: cell_base(dg.cell_pack, KS)), nref_c)
    rep("noderows", timeit(lambda: noderows(
        dg.esup2d, dg.esup_cnt, dg.fsup2d, dg.fsup_cnt, dg.point_pack,
        nodes_d)), 5 * B)


if __name__ == "__main__":
    main()
