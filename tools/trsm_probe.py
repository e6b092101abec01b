"""Probe: replace (_linv_rows + explicit Q = A Li1^T) with a blocked
MXU TRSM computing X = L1^{-1} A^T directly, and G2 = X X^T.

Motivation (kernel stage attribution, tools/kernel_stages.py): the
explicit-inverse route costs _linv_rows (~n^3/2 VPU flops, inside the
783 ns chol+linv stage) PLUS the Q dot (n^2*m MXU MACs, 745 ns).  The
TRSM route does n^2*m/2 MXU MACs total, needs NO explicit Li1, and G2
comes from X with no extra relayout (G2 = X X^T contracts the trailing
m axis in the (NT, n, m) layout X is built in).  Mapply then uses L1
triangular solves (same unrolled column sweeps as the existing L2
solves) instead of Li1 matvecs — cost-neutral (both O(n^2) per apply).

Also probes MXU trailing updates for _chol_panels (rank-8 update as a
batched per-node (ntr x 8)@(8 x ntr) dot vs 8 VPU rank-1 passes).

Usage: python tools/trsm_probe.py [G] [--cpu]  (G tiles of 128 nodes)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    cpu = "--cpu" in sys.argv
    if cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import ninpol_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ninpol_tpu.ops.pallas_chol import (
        NT, _VMEM_LIMIT, _chol_panels, _gram_mxu, _linv_rows)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    G = int(args[0]) if args else (2 if cpu else 128)
    INTERP = cpu
    E, F = 24, 36
    n = 3 * E + 1
    n_pad = -(-n // 8) * 8
    m = E + 3 * F
    f32 = jnp.float32
    B = G * NT
    tiny = 1e-12

    rng = np.random.default_rng(0)
    A_h = rng.standard_normal((G, m, n_pad, NT)).astype(np.float32) * 0.1
    A = jnp.asarray(A_h)
    G_h = (np.einsum("gmnt,gmkt->gnkt", A_h, A_h)
           + 1e-4 * np.eye(n_pad)[None, :, :, None]).astype(np.float32)
    Gm = jnp.asarray(G_h)

    sp = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (i * 0,) * len(dims),
        memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=_VMEM_LIMIT)

    def timeit(name, fn, sync_slice):
        out = fn()
        np.asarray(sync_slice(out))
        t0 = time.perf_counter()
        k = 5
        for _ in range(k):
            out = fn()
        np.asarray(sync_slice(out))
        dt = (time.perf_counter() - t0) / k
        print(f"{name}: {dt*1e3:.2f} ms for {B} nodes = "
              f"{dt/B*1e9:.0f} ns/node", flush=True)
        return out

    HI = jax.lax.Precision.HIGHEST

    # ---- variant A: current route (chol + linv_rows + Q dot + gram2) ---
    def a_kernel(a_ref, g_ref, g2_ref, g_scr, li_scr):
        g_scr[:] = g_ref[0]
        dinvs = _chol_panels(g_scr, n_pad, tiny)
        _linv_rows(g_scr, li_scr, n_pad, dinvs)
        li1 = li_scr[:]
        at = jnp.transpose(a_ref[0], (2, 0, 1))
        qt = jax.lax.dot_general(
            at, jnp.transpose(li1, (2, 0, 1)),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32, precision=HI)
        _gram_mxu(qt, g2_ref.at[0], n_pad, jnp.zeros((n_pad, NT), f32))

    va = jax.jit(lambda a, g: pl.pallas_call(
        a_kernel, grid=(G,), in_specs=[sp(m, n_pad, NT), sp(n_pad, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad, NT), f32),
                        pltpu.VMEM((n_pad, n_pad, NT), f32)],
        compiler_params=cp, interpret=INTERP)(a, g))

    # ---- variant B: blocked MXU TRSM + direct G2 = X X^T ---------------
    def b_kernel(a_ref, g_ref, g2_ref, g_scr, x_scr):
        g_scr[:] = g_ref[0]
        dinvs = _chol_panels(g_scr, n_pad, tiny)
        atT = jnp.transpose(a_ref[0], (2, 1, 0))       # (NT, n_pad, m)
        for k0 in range(0, n_pad, 8):
            blk = atT[:, k0:k0 + 8, :]                 # (NT, 8, m)
            if k0:
                lrow = jnp.transpose(g_scr[:k0, k0:k0 + 8, :],
                                     (2, 1, 0))        # (NT, 8, k0)
                blk = blk - jax.lax.dot_general(
                    lrow, x_scr[:, :k0, :],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32, precision=HI)
            rows = []
            for c in range(8):
                r = blk[:, c, :]                       # (NT, m)
                for p in range(c):
                    lkp = g_scr[k0 + p, k0 + c, :]     # L[k0+c, k0+p]
                    r = r - rows[p] * lkp[:, None]
                r = r * dinvs[k0 + c][:, None]
                rows.append(r)
            x_scr[:, k0:k0 + 8, :] = jnp.stack(rows, axis=1)
        x = x_scr[:]
        g2 = jax.lax.dot_general(x, x, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=f32, precision=HI)
        g2_ref[0] = jnp.transpose(g2, (1, 2, 0))

    vb = jax.jit(lambda a, g: pl.pallas_call(
        b_kernel, grid=(G,), in_specs=[sp(m, n_pad, NT), sp(n_pad, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad, NT), f32),
                        pltpu.VMEM((NT, n_pad, m), f32)],
        compiler_params=cp, interpret=INTERP)(a, g))

    # ---- variant C: chol with MXU trailing updates + TRSM --------------
    def _chol_panels_mxu(gscr):
        dinvs = []
        for k0 in range(0, n_pad, 8):
            pan = gscr[k0:k0 + 8, :, :]
            cols = []
            for c in range(8):
                colc = pan[c]
                for p in range(c):
                    lkp = cols[p][k0 + c, :]
                    colc = colc - cols[p] * lkp[None, :]
                piv = colc[k0 + c, :]
                dinv = jax.lax.rsqrt(jnp.maximum(piv, f32(tiny)))
                colc = colc * dinv[None, :]
                dinvs.append(dinv)
                cols.append(colc)
                gscr[k0 + c, :, :] = colc
            if k0 + 8 < n_pad:
                t = jnp.concatenate(
                    [c[k0 + 8:, None, :] for c in cols], axis=1)
                tt = jnp.transpose(t, (2, 0, 1))       # (NT, ntr, 8)
                upd = jax.lax.dot_general(
                    tt, tt, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=f32, precision=HI)
                gscr[k0 + 8:, k0 + 8:, :] = (
                    gscr[k0 + 8:, k0 + 8:, :]
                    - jnp.transpose(upd, (1, 2, 0)))
        return dinvs

    def c_kernel(a_ref, g_ref, g2_ref, g_scr, x_scr):
        g_scr[:] = g_ref[0]
        dinvs = _chol_panels_mxu(g_scr)
        atT = jnp.transpose(a_ref[0], (2, 1, 0))
        for k0 in range(0, n_pad, 8):
            blk = atT[:, k0:k0 + 8, :]
            if k0:
                lrow = jnp.transpose(g_scr[:k0, k0:k0 + 8, :], (2, 1, 0))
                blk = blk - jax.lax.dot_general(
                    lrow, x_scr[:, :k0, :],
                    (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32, precision=HI)
            rows = []
            for c in range(8):
                r = blk[:, c, :]
                for p in range(c):
                    lkp = g_scr[k0 + p, k0 + c, :]
                    r = r - rows[p] * lkp[:, None]
                r = r * dinvs[k0 + c][:, None]
                rows.append(r)
            x_scr[:, k0:k0 + 8, :] = jnp.stack(rows, axis=1)
        x = x_scr[:]
        g2 = jax.lax.dot_general(x, x, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=f32, precision=HI)
        g2_ref[0] = jnp.transpose(g2, (1, 2, 0))

    vc = jax.jit(lambda a, g: pl.pallas_call(
        c_kernel, grid=(G,), in_specs=[sp(m, n_pad, NT), sp(n_pad, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad, NT), f32),
                        pltpu.VMEM((NT, n_pad, m), f32)],
        compiler_params=cp, interpret=INTERP)(a, g))

    oa = timeit("A: chol + linv_rows + Q dot + gram2", lambda: va(A, Gm),
                lambda o: o[:1, :1, :1, :1])
    ob = timeit("B: chol + MXU TRSM + XX^T", lambda: vb(A, Gm),
                lambda o: o[:1, :1, :1, :1])
    oc = timeit("C: MXU-trailing chol + TRSM + XX^T", lambda: vc(A, Gm),
                lambda o: o[:1, :1, :1, :1])

    # correctness vs NumPy float64 reference on a few nodes
    na = np.asarray(oa[:1])
    nb = np.asarray(ob[:1])
    nc = np.asarray(oc[:1])
    g0 = np.asarray(G_h[0], np.float64)                # (n, n, NT)
    a0 = np.asarray(A_h[0], np.float64)                # (m, n, NT)
    errs = {"A": 0.0, "B": 0.0, "C": 0.0}
    for t in range(0, NT, 37):
        L = np.linalg.cholesky(g0[:, :, t])
        X = np.linalg.solve(L, a0[:, :, t].T)          # (n, m)
        G2 = X @ X.T
        sc = np.abs(G2).max()
        errs["A"] = max(errs["A"], np.abs(na[0, :, :, t] - G2).max() / sc)
        errs["B"] = max(errs["B"], np.abs(nb[0, :, :, t] - G2).max() / sc)
        errs["C"] = max(errs["C"], np.abs(nc[0, :, :, t] - G2).max() / sc)
    print("rel err vs f64 reference:", {k: f"{v:.2e}" for k, v in errs.items()})
    print("B vs A agree:", f"{np.abs(nb - na).max():.2e}",
          " C vs B:", f"{np.abs(nc - nb).max():.2e}")


if __name__ == "__main__":
    main()
