"""Probe the fused-kernel per-grid-step floor: input DMA vs descriptors.

A trivial-body pallas kernel with the production input block shapes
costs ~400+ ns/node (round-5 noop probe) — a third of the whole solve
kernel.  This probe discriminates descriptor-count-bound from
bytes-bound:

  A  9 inputs / 5 outputs, 1 tile per step   (production structure)
  B  3 merged inputs / 2 merged outputs      (fewer descriptors,
                                              same bytes)
  C  like A but 2 tiles per grid step        (same descriptors per
                                              step, double bytes)
  D  like B with 2 tiles per step            (both)

Usage: python tools/r5_floor_probe.py [G]
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ninpol_tpu.ops.pallas_chol import NT, _VMEM_LIMIT

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    E, F = 24, 36
    B = G * NT
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=_VMEM_LIMIT)

    def timeit(name, fn, sync_slice):
        out = fn()
        np.asarray(sync_slice(out))
        k = 5
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        np.asarray(sync_slice(out))
        dt = (time.perf_counter() - t0) / k
        print(f"{name}: {dt*1e3:.2f} ms = {dt/B*1e9:.0f} ns/node",
              flush=True)
        return dt

    def sp(t, *dims):
        return pl.BlockSpec((t,) + dims,
                            (lambda i: (i,) + (i * 0,) * len(dims)),
                            memory_space=pltpu.VMEM)

    # ---- A: production structure, trivial body ------------------------
    ins = [jnp.asarray(rng.standard_normal(s), f32) for s in [
        (G, 6, NT), (G, 6, E, NT), (G, 28, F, NT), (G, 2, F, NT),
        (G, E, NT), (G, E, NT), (G, F, NT), (G, 1, NT), (G, 1, NT)]]

    def body_a(p, c, f, k, ks, cv, fv, ne, vl,
               wh, wl, wnh, wnl, rn):
        red = (f[0][0] + p[0][0][None, :] + c[0][0][0][None, :]
               + k[0][0][0][None, :] + ks[0][0][None, :]
               + cv[0][0][None, :] + fv[0][0][None, :] + ne[0] + vl[0])
        wh[0] = jnp.broadcast_to(red[:1], (E, NT))
        wl[0] = jnp.broadcast_to(red[1:2], (E, NT))
        wnh[0] = red[:1]
        wnl[0] = red[1:2]
        rn[0] = red[2:3]

    fa = jax.jit(lambda *a: pl.pallas_call(
        body_a, grid=(G,),
        in_specs=[sp(1, 6, NT), sp(1, 6, E, NT), sp(1, 28, F, NT),
                  sp(1, 2, F, NT), sp(1, E, NT), sp(1, E, NT),
                  sp(1, F, NT), sp(1, 1, NT), sp(1, 1, NT)],
        out_specs=[sp(1, E, NT), sp(1, E, NT), sp(1, 1, NT),
                   sp(1, 1, NT), sp(1, 1, NT)],
        out_shape=[jax.ShapeDtypeStruct((G, E, NT), f32)] * 2
        + [jax.ShapeDtypeStruct((G, 1, NT), f32)] * 3,
        compiler_params=cp)(*a))
    timeit("A 9in/5out 1-tile", lambda: fa(*ins), lambda o: o[0][:1, :1, :1])

    # ---- B: merged 3 inputs / 2 outputs -------------------------------
    fpkM = jnp.asarray(rng.standard_normal((G, 31 * F, NT)), f32)
    cpkM = jnp.asarray(rng.standard_normal((G, 8 * E, NT)), f32)
    ppkM = jnp.asarray(rng.standard_normal((G, 8, NT)), f32)

    def body_b(fm, cm, pm, w2, r3):
        red = fm[0][:F] + cm[0][0][None, :] + pm[0][0][None, :]
        w2[0] = jnp.broadcast_to(red[:1], (2 * E, NT))
        r3[0] = red[:3]

    fb = jax.jit(lambda *a: pl.pallas_call(
        body_b, grid=(G,),
        in_specs=[sp(1, 31 * F, NT), sp(1, 8 * E, NT), sp(1, 8, NT)],
        out_specs=[sp(1, 2 * E, NT), sp(1, 3, NT)],
        out_shape=[jax.ShapeDtypeStruct((G, 2 * E, NT), f32),
                   jax.ShapeDtypeStruct((G, 3, NT), f32)],
        compiler_params=cp)(*a))
    timeit("B 3in/2out 1-tile", lambda: fb(fpkM, cpkM, ppkM),
           lambda o: o[0][:1, :1, :1])

    # ---- C: production arrays, 2 tiles per step -----------------------
    G2 = G // 2

    def body_c(p, c, f, k, ks, cv, fv, ne, vl,
               wh, wl, wnh, wnl, rn):
        for t in range(2):
            red = (f[t][0] + p[t][0][None, :] + c[t][0][0][None, :]
                   + k[t][0][0][None, :] + ks[t][0][None, :]
                   + cv[t][0][None, :] + fv[t][0][None, :]
                   + ne[t] + vl[t])
            wh[t] = jnp.broadcast_to(red[:1], (E, NT))
            wl[t] = jnp.broadcast_to(red[1:2], (E, NT))
            wnh[t] = red[:1]
            wnl[t] = red[1:2]
            rn[t] = red[2:3]

    fc = jax.jit(lambda *a: pl.pallas_call(
        body_c, grid=(G2,),
        in_specs=[sp(2, 6, NT), sp(2, 6, E, NT), sp(2, 28, F, NT),
                  sp(2, 2, F, NT), sp(2, E, NT), sp(2, E, NT),
                  sp(2, F, NT), sp(2, 1, NT), sp(2, 1, NT)],
        out_specs=[sp(2, E, NT), sp(2, E, NT), sp(2, 1, NT),
                   sp(2, 1, NT), sp(2, 1, NT)],
        out_shape=[jax.ShapeDtypeStruct((G, E, NT), f32)] * 2
        + [jax.ShapeDtypeStruct((G, 1, NT), f32)] * 3,
        compiler_params=cp)(*a))
    timeit("C 9in/5out 2-tile", lambda: fc(*ins), lambda o: o[0][:1, :1, :1])

    # ---- D: merged + 2 tiles per step ---------------------------------
    def body_d(fm, cm, pm, w2, r3):
        for t in range(2):
            red = fm[t][:F] + cm[t][0][None, :] + pm[t][0][None, :]
            w2[t] = jnp.broadcast_to(red[:1], (2 * E, NT))
            r3[t] = red[:3]

    fd = jax.jit(lambda *a: pl.pallas_call(
        body_d, grid=(G2,),
        in_specs=[sp(2, 31 * F, NT), sp(2, 8 * E, NT), sp(2, 8, NT)],
        out_specs=[sp(2, 2 * E, NT), sp(2, 3, NT)],
        out_shape=[jax.ShapeDtypeStruct((G, 2 * E, NT), f32),
                   jax.ShapeDtypeStruct((G, 3, NT), f32)],
        compiler_params=cp)(*a))
    timeit("D 3in/2out 2-tile", lambda: fd(fpkM, cpkM, ppkM),
           lambda o: o[0][:1, :1, :1])


if __name__ == "__main__" and os.environ.get("FLOOR_EXTRA") != "1":
    main()


def extra():
    """E: case A with dimension_semantics=('parallel',) — does Mosaic
    double-buffer the input stream then?  F: half-size fpk (bytes test)."""
    import ninpol_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ninpol_tpu.ops.pallas_chol import NT, _VMEM_LIMIT
    import numpy as np
    import time

    G = 128
    E, F = 24, 36
    B = G * NT
    f32 = jnp.float32
    rng = np.random.default_rng(0)

    def sp(t, *dims):
        return pl.BlockSpec((t,) + dims,
                            (lambda i: (i,) + (i * 0,) * len(dims)),
                            memory_space=pltpu.VMEM)

    def timeit(name, fn, sync_slice):
        out = fn()
        np.asarray(sync_slice(out))
        k = 5
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        np.asarray(sync_slice(out))
        dt = (time.perf_counter() - t0) / k
        print(f"{name}: {dt*1e3:.2f} ms = {dt/B*1e9:.0f} ns/node",
              flush=True)

    ins = [jnp.asarray(rng.standard_normal(s), f32) for s in [
        (G, 6, NT), (G, 6, E, NT), (G, 28, F, NT), (G, 2, F, NT),
        (G, E, NT), (G, E, NT), (G, F, NT), (G, 1, NT), (G, 1, NT)]]

    def body_a(p, c, f, k, ks, cv, fv, ne, vl,
               wh, wl, wnh, wnl, rn):
        red = (f[0][0] + p[0][0][None, :] + c[0][0][0][None, :]
               + k[0][0][0][None, :] + ks[0][0][None, :]
               + cv[0][0][None, :] + fv[0][0][None, :] + ne[0] + vl[0])
        wh[0] = jnp.broadcast_to(red[:1], (E, NT))
        wl[0] = jnp.broadcast_to(red[1:2], (E, NT))
        wnh[0] = red[:1]
        wnl[0] = red[1:2]
        rn[0] = red[2:3]

    for sem in ("parallel", "arbitrary"):
        cp2 = pltpu.CompilerParams(dimension_semantics=(sem,),
                                   vmem_limit_bytes=_VMEM_LIMIT)
        fe = jax.jit(lambda *a: pl.pallas_call(
            body_a, grid=(G,),
            in_specs=[sp(1, 6, NT), sp(1, 6, E, NT), sp(1, 28, F, NT),
                      sp(1, 2, F, NT), sp(1, E, NT), sp(1, E, NT),
                      sp(1, F, NT), sp(1, 1, NT), sp(1, 1, NT)],
            out_specs=[sp(1, E, NT), sp(1, E, NT), sp(1, 1, NT),
                       sp(1, 1, NT), sp(1, 1, NT)],
            out_shape=[jax.ShapeDtypeStruct((G, E, NT), f32)] * 2
            + [jax.ShapeDtypeStruct((G, 1, NT), f32)] * 3,
            compiler_params=cp2)(*a))
        timeit(f"E sem={sem}", lambda: fe(*ins), lambda o: o[0][:1, :1, :1])

    # F: fpk half rows (bytes scaling check)
    cp2 = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=_VMEM_LIMIT)
    ins_f = list(ins)
    ins_f[2] = jnp.asarray(rng.standard_normal((G, 14, F, NT)), f32)

    def body_f(p, c, f, k, ks, cv, fv, ne, vl,
               wh, wl, wnh, wnl, rn):
        body_a(p, c, f, k, ks, cv, fv, ne, vl, wh, wl, wnh, wnl, rn)

    ff = jax.jit(lambda *a: pl.pallas_call(
        body_f, grid=(G,),
        in_specs=[sp(1, 6, NT), sp(1, 6, E, NT), sp(1, 14, F, NT),
                  sp(1, 2, F, NT), sp(1, E, NT), sp(1, E, NT),
                  sp(1, F, NT), sp(1, 1, NT), sp(1, 1, NT)],
        out_specs=[sp(1, E, NT), sp(1, E, NT), sp(1, 1, NT),
                   sp(1, 1, NT), sp(1, 1, NT)],
        out_shape=[jax.ShapeDtypeStruct((G, E, NT), f32)] * 2
        + [jax.ShapeDtypeStruct((G, 1, NT), f32)] * 3,
        compiler_params=cp2)(*a))
    timeit("F fpk 14 rows", lambda: ff(*ins_f), lambda o: o[0][:1, :1, :1])


if __name__ == "__main__" and os.environ.get("FLOOR_EXTRA") == "1":
    extra()
