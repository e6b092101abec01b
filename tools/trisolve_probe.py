"""Probe: can triangular SOLVES replace the round-2 explicit L^{-1}?

The fused GLS kernel currently forms lc = Li2 @ Li1 explicitly via
_linv_rows (~n^3/2 VPU flops per round) so Mapply is two dense
triangular matvecs.  The alternative keeps only the round-2 Cholesky
factor L2 (column planes, as _chol_panels leaves it) and applies
M r = Li1^T L2^{-T} (L2^{-1} (Li1 r)) with two sequential triangular
solves per application — O(n^2) flops but an ~n-step dependence chain,
which on the VPU may be latency-bound.  This probe times, at the
production shape (n_pad=80, NT=128):

  a) linv2:   _linv_rows(mul=li1)            [the cost to be removed]
  b) mapply4: 4x (two matvecs with lc)       [current Mapply cost]
  c) solve4:  4x (matvec Li1, fwd solve L2, bwd solve L2^T, matvec Li1^T)

Verdict rule: solves win iff  c - b < a.

Usage: python tools/trisolve_probe.py [G]  (default 64 tiles = 8k nodes)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ninpol_tpu.ops.pallas_chol import (NT, _VMEM_LIMIT, _chol_panels,
                                            _linv_rows)

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_pad = 80
    f32 = jnp.float32
    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=_VMEM_LIMIT)
    sp = lambda *dims: pl.BlockSpec((1,) + dims,
                                    lambda i: (i,) + (i * 0,) * len(dims),
                                    memory_space=pltpu.VMEM)

    rng = np.random.default_rng(0)
    # SPD inputs: moderate conditioning like the round-2 Gram
    Araw = rng.standard_normal((G, 160, n_pad)).astype(np.float32)
    Gm = jnp.asarray(np.einsum("gmn,gmk->gnk", Araw, Araw)
                     + 1e-3 * np.eye(n_pad, dtype=np.float32))
    # tile layout (G, n, n, NT): all NT lanes share one matrix per tile
    # (timing only — the datapath cost is lane-independent)
    GmL = jnp.transpose(
        jnp.broadcast_to(Gm[:, None, :, :], (G, NT, n_pad, n_pad)),
        (0, 2, 3, 1))                                   # (G, n, n, NT)
    V = jnp.asarray(rng.standard_normal((G, n_pad, NT)).astype(np.float32))

    def timeit(name, fn, probe):
        o = fn()
        np.asarray(jax.tree_util.tree_leaves(probe(o))[0])  # sync
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            o = fn()
        np.asarray(jax.tree_util.tree_leaves(probe(o))[0])
        dt = (time.perf_counter() - t0) / reps
        B = G * NT
        print(f"{name:34s} {dt*1e3:8.2f} ms  {dt/B*1e9:7.0f} ns/node",
              flush=True)
        return dt

    # ---- a) chol alone and chol + linv2(mul) ------------------------------
    def chol_kernel(g_ref, o_ref, li_scr):
        gs = o_ref.at[0]
        gs[:] = g_ref[0]
        dinvs = _chol_panels(gs, n_pad, 1e-12)
        li_scr[0, 0, :] = dinvs[0]  # keep alive

    chol = jax.jit(lambda g: pl.pallas_call(
        chol_kernel, grid=(G,), in_specs=[sp(n_pad, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        scratch_shapes=[pltpu.VMEM((1, 1, NT), f32)],
        compiler_params=cp)(g))
    t_chol = timeit("chol panels", lambda: chol(GmL),
                    lambda o: o[:1, :1, :1, :1])

    def chol_linv_kernel(g_ref, li_ref, g_scr):
        g_scr[:] = g_ref[0]
        gs = g_scr.at[:]
        dinvs = _chol_panels(gs, n_pad, 1e-12)
        mul = g_ref[0]  # stand-in triangular 'li1' rows (same shape)
        _linv_rows(gs, li_ref.at[0], n_pad, dinvs, mul=mul)

    chol_linv = jax.jit(lambda g: pl.pallas_call(
        chol_linv_kernel, grid=(G,), in_specs=[sp(n_pad, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad, NT), f32)],
        compiler_params=cp)(g))
    t_chol_linv = timeit("chol + linv2(mul)", lambda: chol_linv(GmL),
                         lambda o: o[:1, :1, :1, :1])
    print(f"{'-> linv2 alone':34s} {'':8s}  "
          f"{(t_chol_linv - t_chol)/(G*NT)*1e9:7.0f} ns/node")

    # ---- b) 4x Mapply with explicit lc (current) ---------------------------
    def mapply_kernel(lc_ref, v_ref, o_ref):
        lc = lc_ref[0]
        v = v_ref[0]
        for _ in range(4):
            w1 = jnp.sum(lc * v[None, :, :], axis=1)
            v = jnp.sum(lc * w1[:, None, :], axis=0)
        o_ref[0] = v

    mapply = jax.jit(lambda lc, v: pl.pallas_call(
        mapply_kernel, grid=(G,),
        in_specs=[sp(n_pad, n_pad, NT), sp(n_pad, NT)],
        out_specs=sp(n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, NT), f32),
        compiler_params=cp)(lc, v))
    t_mapply = timeit("mapply4 (2 matvecs w/ lc)",
                      lambda: mapply(GmL, V), lambda o: o[:1, :1, :1])

    # ---- c) 4x Mapply via solves -------------------------------------------
    # L2 in column planes (gscr layout), unit-ish dinv; li1 explicit.
    def solve_kernel(g_ref, li_ref, v_ref, o_ref, g_scr):
        g_scr[:] = g_ref[0]
        gs = g_scr.at[:]
        dinvs = _chol_panels(gs, n_pad, 1e-12)
        dstk = jnp.stack(dinvs, axis=0)                 # (n, NT)
        li1 = li_ref[0]
        v = v_ref[0]
        L = g_scr[:]                                    # column planes
        import jax as _jax
        row_iota = _jax.lax.broadcasted_iota(jnp.int32, (n_pad, 1), 0)
        for _ in range(4):
            # u = Li1 v (row planes x v)
            u = jnp.sum(li1 * v[None, :, :], axis=1)
            # forward: x = L^{-1} u, column sweep
            x = u
            for k in range(n_pad):
                xk = x[k, :] * dinvs[k]                 # (NT,)
                below = (row_iota > k).astype(f32)      # (n, 1)
                colk = L[k] * below                     # col k, rows>k
                upd = colk * xk[None, :]
                x = x - upd
                # pin x[k] to solved value
                isk = (row_iota == k).astype(f32)
                x = x * (1 - isk) + isk * xk[None, :]
            # backward: y = L^{-T} x, reverse sweep with masked reduces
            y = x
            for k in range(n_pad - 1, -1, -1):
                below = (row_iota > k).astype(f32)
                s = jnp.sum(L[k] * below * y, axis=0)   # (NT,)
                yk = (y[k, :] - s) * dinvs[k]
                isk = (row_iota == k).astype(f32)
                y = y * (1 - isk) + isk * yk[None, :]
            # out = Li1^T y
            v = jnp.sum(li1 * y[:, None, :], axis=0)
        o_ref[0] = v

    solve = jax.jit(lambda g, li, v: pl.pallas_call(
        solve_kernel, grid=(G,),
        in_specs=[sp(n_pad, n_pad, NT), sp(n_pad, n_pad, NT),
                  sp(n_pad, NT)],
        out_specs=sp(n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, NT), f32),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad, NT), f32)],
        compiler_params=cp)(g, li, v))
    t_solve = timeit("chol + solve4 (fwd+bwd solves)",
                     lambda: solve(GmL, GmL, V), lambda o: o[:1, :1, :1])

    print(f"\nverdict: solves {'WIN' if t_solve - t_chol < t_mapply + (t_chol_linv - t_chol) else 'LOSE'}: "
          f"solve4-chol = {(t_solve - t_chol)/(G*NT)*1e9:.0f} ns/node vs "
          f"mapply4+linv2 = {(t_mapply + t_chol_linv - t_chol)/(G*NT)*1e9:.0f} ns/node")


if __name__ == "__main__":
    main()
