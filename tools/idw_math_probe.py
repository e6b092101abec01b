"""Where does IDW device time go at 2.1M-point hexa scale?

Times, on real TPU at the production dispatch shape (S=16 scan over
131072-node chunks, E=8):
  a) the production kernel (_idw_bucket_scan): gathers + EMULATED-f64
     distance math (hi+lo reconstruction),
  b) an f32-math variant with the same gathers (the gather/dispatch
     floor),
  c) a df32 (hi/lo pair arithmetic) variant — candidate replacement.

The reference's in-memory time to beat is 0.428 s (performance.yaml
ALH.hexa, 16-thread Cython), and our measurement includes a ~30 ms
dependent-fetch sync the reference doesn't pay.

Usage: python tools/idw_math_probe.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import ninpol_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from functools import partial
    from ninpol_tpu._methods.idw import _idw_bucket_scan
    from ninpol_tpu.ops import df32 as dd

    S, B, E = 16, 131072, 8
    n_pts = 2_146_689
    n_cells = 2_097_152
    rng = np.random.default_rng(0)

    pts = rng.random((n_pts, 3))
    cens = rng.random((n_cells, 3))

    def hpack(a):
        h = a.astype(np.float32)
        return np.concatenate(
            [h, (a - h.astype(np.float64)).astype(np.float32)], axis=1)

    point_pack = jnp.asarray(hpack(pts))
    cell_pack = jnp.asarray(hpack(cens))
    esup2d = jnp.asarray(
        rng.integers(0, n_cells, (n_pts, E)).astype(np.int32))
    esup_cnt = jnp.asarray(np.full(n_pts, E, np.int32))
    nodes = np.arange(S * B, dtype=np.int32) % n_pts
    nodes_s = jnp.asarray(nodes.reshape(S, B))
    valid_s = jnp.asarray(np.ones((S, B), bool))

    def timeit(name, fn):
        out = fn()
        np.asarray(out[:1, :1])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            np.asarray(out[:1, :1])
            times.append(time.perf_counter() - t0)
        print(f"{name}: {min(times):.3f}s for {S*B} nodes "
              f"(runs {[round(t,3) for t in times]})", flush=True)

    # a) production (f64-emulated math)
    timeit("idw production (emulated f64)", lambda: _idw_bucket_scan(
        nodes_s, valid_s, esup2d, esup_cnt, point_pack, cell_pack,
        E=E, dim=3))

    # b) f32 floor — same gathers, f32 math
    def _idw_f32(nodes, valid, esup2d, esup_cnt, point_pack, cell_pack,
                 *, E, dim):
        f32 = jnp.float32
        KSetv = esup2d[nodes, :E]
        n_elem = jnp.minimum(esup_cnt[nodes], E)
        cv = (jnp.arange(E)[None, :] < n_elem[:, None]) & (KSetv >= 0)
        KS = jnp.where(cv, KSetv, 0)
        pp = point_pack[nodes]
        cp = cell_pack[KS]
        xv = pp[:, 0:dim]
        xc = cp[:, :, 0:dim]
        d2 = jnp.sum((xv[:, None, :] - xc) ** 2, axis=2).astype(f32)
        d = jnp.sqrt(jnp.where(cv, d2, 1.0))
        inv = jnp.where(cv, 1.0 / d, 0.0)
        w = inv / jnp.sum(inv, axis=1, keepdims=True)
        return jnp.where(valid[:, None] & cv, w, 0.0)

    @partial(jax.jit, static_argnames=("E", "dim"))
    def scan_f32(nodes_s, valid_s, *args, E, dim):
        def body(c, nv):
            return c, _idw_f32(nv[0], nv[1], *args, E=E, dim=dim)
        _, w = jax.lax.scan(body, 0, (nodes_s, valid_s))
        return w.reshape(-1, E)

    timeit("idw f32 floor", lambda: scan_f32(
        nodes_s, valid_s, esup2d, esup_cnt, point_pack, cell_pack,
        E=E, dim=3))

    # c) df32 candidate: pair arithmetic, rsqrt via f32 seed + one
    # df32 Newton step (|rel err| ~ 2^-40)
    def _idw_df32(nodes, valid, esup2d, esup_cnt, point_pack, cell_pack,
                  *, E, dim):
        f32 = jnp.float32
        f64 = jnp.float64
        KSetv = esup2d[nodes, :E]
        n_elem = jnp.minimum(esup_cnt[nodes], E)
        cv = (jnp.arange(E)[None, :] < n_elem[:, None]) & (KSetv >= 0)
        KS = jnp.where(cv, KSetv, 0)
        pp = point_pack[nodes]
        cp = cell_pack[KS]
        d2 = None
        for c in range(dim):
            dv = dd.add((cp[:, :, c], cp[:, :, 3 + c]),
                        dd.neg((pp[:, c:c+1], pp[:, 3+c:4+c])))
            p = dd.mul(dv, dv)
            d2 = p if d2 is None else dd.add(d2, p)
        d2 = (jnp.where(cv, d2[0], f32(1.0)),
              jnp.where(cv, d2[1], f32(0.0)))
        # inv = 1/sqrt(d2): f32 rsqrt seed + one df32 Newton step
        y0 = jax.lax.rsqrt(jnp.maximum(d2[0], f32(1e-30)))
        y = (y0, jnp.zeros_like(y0))
        y2 = dd.mul(y, y)
        r = dd.add((f32(3.0) + jnp.zeros_like(y0), jnp.zeros_like(y0)),
                   dd.neg(dd.mul(d2, y2)))
        y = dd.mul(dd.scale(y, f32(0.5)), r)
        invh = jnp.where(cv, y[0], f32(0.0))
        invl = jnp.where(cv, y[1], f32(0.0))
        sh, sl = dd.tree_sum((invh, invl), axis=1)
        inv64 = invh.astype(f64) + invl.astype(f64)
        s64 = (sh.astype(f64) + sl.astype(f64))[:, None]
        w = inv64 / s64
        return jnp.where(valid[:, None] & cv, w, 0.0)

    @partial(jax.jit, static_argnames=("E", "dim"))
    def scan_df32(nodes_s, valid_s, *args, E, dim):
        def body(c, nv):
            return c, _idw_df32(nv[0], nv[1], *args, E=E, dim=dim)
        _, w = jax.lax.scan(body, 0, (nodes_s, valid_s))
        return w.reshape(-1, E)

    timeit("idw df32 candidate", lambda: scan_df32(
        nodes_s, valid_s, esup2d, esup_cnt, point_pack, cell_pack,
        E=E, dim=3))

    # accuracy of (c) vs production on a slice
    wa = np.asarray(_idw_bucket_scan(
        nodes_s[:1], valid_s[:1], esup2d, esup_cnt, point_pack,
        cell_pack, E=E, dim=3))
    wc = np.asarray(scan_df32(
        nodes_s[:1], valid_s[:1], esup2d, esup_cnt, point_pack,
        cell_pack, E=E, dim=3))
    print(f"df32 vs f64 max |dw|: {np.abs(wa - wc).max():.3e}",
          flush=True)


if __name__ == "__main__":
    main()
