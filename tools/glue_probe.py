"""Attribute the per-chunk XLA glue around the fused solve kernel.

The scan-stacked interior chunk at (E=24, F=36, B=16384) runs ~47.5 ms
while the fused kernel alone runs ~28.6 ms (tools/perf_probe.py after
the tri flip) — ~19 ms/chunk of glue.  This probe times, on one REAL
bucket of a tet mesh (default n=28 -> 132k cells):
  a) the packed gathers alone,
  b) gathers + the tile_kc/tile_k transposes (exactly the fused
     prologue's XLA part),
  c) b) + the untile/f64 epilogue shape (on dummy kernel-shaped
     outputs) to bound the epilogue's share.

Usage: python tools/glue_probe.py [n]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    return np.asarray(x)


def timeit(fn, out, k=8):
    fn()  # compile
    sync(out(fn()))
    t0 = time.perf_counter()
    r = None
    for _ in range(k):
        r = fn()
    sync(out(r))
    return (time.perf_counter() - t0) / k


def main():
    import jax
    import jax.numpy as jnp
    from bench import build_problem
    from ninpol_tpu.ops.pallas_chol import NT

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 28
    interp, bt = build_problem(n)
    grid = interp.grid
    tp = np.arange(grid.n_points)
    print(f"# mesh {grid.n_elems} cells {grid.n_points} pts build "
          f"{bt:.1f}s", flush=True)

    # warm the face cache (prepare also warms programs; cheap at n=28)
    wdev = interp.prepare_interpolator("gls", "u", tp, device_out=True)
    _ = sync(wdev[-1:, -1:])

    dg = interp.device_grid
    act = ~grid.boundary_points.astype(bool)
    bucket = max((b for b in dg.buckets(tp, act, chunk_size=16384,
                                        chunk_elems=interp.gls.chunk_elems)),
                 key=lambda b: len(b["pos"]))
    E, F, B = bucket["E"], bucket["F"], len(bucket["pos"])
    print(f"# bucket E={E} F={F} B={B}", flush=True)
    fc = interp.gls._face_cache
    face_pack = fc[0]
    nodes_d = jnp.asarray(bucket["nodes"])
    esup2d, esup_cnt = dg.esup2d, dg.esup_cnt
    fsup2d, fsup_cnt = dg.fsup2d, dg.fsup_cnt
    point_pack, cell_pack = dg.point_pack, dg.cell_pack
    f32 = jnp.float32
    Gt = B // NT

    def gathers(nodes, esup2d, esup_cnt, fsup2d, fsup_cnt,
                point_pack, cell_pack, face_pack):
        KSetv = esup2d[nodes, :E]
        n_elem = jnp.minimum(esup_cnt[nodes], E)
        cell_valid = ((jnp.arange(E)[None, :] < n_elem[:, None])
                      & (KSetv >= 0))
        KS = jnp.where(cell_valid, KSetv, 0)
        Sv = fsup2d[nodes, :F]
        n_face = jnp.minimum(fsup_cnt[nodes], F)
        face_valid = ((jnp.arange(F)[None, :] < n_face[:, None])
                      & (Sv >= 0))
        SF = jnp.where(face_valid, Sv, 0)
        fpk = face_pack[SF]
        fpk = jax.lax.optimization_barrier(fpk)
        pair = jax.lax.bitcast_convert_type(fpk[:, :, 0:2], jnp.int32)
        fpk = fpk[:, :, 2:]
        cpk = cell_pack[KS]
        ppk = point_pack[nodes]
        return ppk, cpk, fpk, pair, KS, cell_valid, face_valid

    def tile_kc(x):
        K, C = x.shape[1], x.shape[2]
        return jnp.transpose(x.reshape(Gt, NT, K, C), (0, 3, 2, 1))

    def tile_k(x):
        return jnp.transpose(x.reshape(Gt, NT, -1), (0, 2, 1))

    packs = (esup2d, esup_cnt, fsup2d, fsup_cnt, point_pack,
             cell_pack, face_pack)

    @jax.jit
    def gathers_only(nodes, *packs):
        ppk, cpk, fpk, pair, KS, cv, fv = gathers(nodes, *packs)
        return (ppk.sum() + cpk.sum() + fpk.sum() + pair.sum()
                + KS.sum())

    @jax.jit
    def gathers_tiled(nodes, *packs):
        ppk, cpk, fpk, pair, KS, cv, fv = gathers(nodes, *packs)
        ts = (tile_k(ppk), tile_kc(cpk), tile_kc(fpk), tile_kc(pair),
              tile_k(KS.astype(jnp.int32)), tile_k(cv.astype(f32)),
              tile_k(fv.astype(f32)))
        return sum(t.sum(dtype=jnp.float32)
                   if t.dtype != jnp.int32 else t.sum().astype(f32)
                   for t in ts)

    @jax.jit
    def epilogue(wh, wl, rnt):
        untile = lambda x: jnp.transpose(x, (0, 2, 1)).reshape(B, -1)
        w = untile(wh).astype(jnp.float64) + untile(wl).astype(jnp.float64)
        rn = untile(rnt).astype(jnp.float64)[:, 0]
        return w.sum() + rn.sum()

    rng = np.random.default_rng(0)
    wh = jnp.asarray(rng.standard_normal((Gt, E, NT)), f32)
    wl = jnp.asarray(rng.standard_normal((Gt, E, NT)), f32)
    rnt = jnp.asarray(rng.standard_normal((Gt, 1, NT)), f32)

    dtg = timeit(lambda: gathers_only(nodes_d, *packs), lambda o: o)
    print(f"# gathers only:        {dtg*1e3:7.2f} ms/chunk "
          f"({dtg/B*1e9:5.0f} ns/node)", flush=True)
    dtt = timeit(lambda: gathers_tiled(nodes_d, *packs), lambda o: o)
    print(f"# gathers + tiling:    {dtt*1e3:7.2f} ms/chunk "
          f"({dtt/B*1e9:5.0f} ns/node)  [tiling = "
          f"{(dtt-dtg)*1e3:.2f} ms]", flush=True)
    dte = timeit(lambda: epilogue(wh, wl, rnt), lambda o: o)
    print(f"# untile/f64 epilogue: {dte*1e3:7.2f} ms/chunk "
          f"({dte/B*1e9:5.0f} ns/node)", flush=True)


if __name__ == "__main__":
    main()
