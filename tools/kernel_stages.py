"""Per-stage microbenchmark of the fused-solve helpers on real TPU.

Times pallas kernels that wrap exactly the stage helpers of
ops/pallas_chol (_gram_mxu, _chol_panels + _linv_rows, the MXU
Q = A Li^T dot, and the df32 sweep operator cost via a Mapply-style
pass) on synthetic VMEM-resident tiles at the production shape.  Small
programs -> fast compiles -> quick iteration on the helpers.

Usage: python tools/kernel_stages.py [G] (default 128 tiles = 16k nodes)
"""
import functools
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
    from ninpol_tpu.ops.pallas_chol import (
        NT, _VMEM_LIMIT, _chol_panels, _gram_mxu, _linv_rows)

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    E, F = 24, 40
    n = 3 * E + 1
    n_pad = -(-n // 8) * 8
    m = E + 3 * F
    f32 = jnp.float32
    B = G * NT

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((G, m, n_pad, NT)) * 0.1, f32)
    Gm = jnp.asarray(
        np.broadcast_to(np.eye(n_pad)[None, :, :, None] * 4.0,
                        (G, n_pad, n_pad, NT))
        + rng.standard_normal((G, n_pad, n_pad, NT)) * 0.01, f32)

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
        return dt

    # ---- stage: Gram (MXU, incl. transpose in) ----------------------------
    def gram_kernel(a_ref, o_ref):
        at = jnp.transpose(a_ref[0], (2, 0, 1))
        dv = jnp.zeros((n_pad, NT), f32)
        _gram_mxu(at, o_ref.at[0], n_pad, dv)

    gram = jax.jit(lambda a: pl.pallas_call(
        gram_kernel, grid=(G,), in_specs=[sp(m, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        compiler_params=cp)(a))
    timeit("gram (MXU + transposes)", lambda: gram(A),
           lambda o: o[:1, :1, :1, :1])

    # ---- stage: chol + linv ----------------------------------------------
    def chol_kernel(g_ref, li_ref, g_scr):
        g_scr[:] = g_ref[0]
        dinvs = _chol_panels(g_scr, n_pad, 1e-12)
        _linv_rows(g_scr, li_ref.at[0], n_pad, dinvs)

    chol = jax.jit(lambda g: pl.pallas_call(
        chol_kernel, grid=(G,), in_specs=[sp(n_pad, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        scratch_shapes=[pltpu.VMEM((n_pad, n_pad, NT), f32)],
        compiler_params=cp)(g))
    timeit("chol panels + linv rows", lambda: chol(Gm),
           lambda o: o[:1, :1, :1, :1])

    # ---- stage: Q = A Li^T (MXU, incl. transposes in) ---------------------
    def q_kernel(a_ref, li_ref, q_ref):
        at = jnp.transpose(a_ref[0], (2, 0, 1))        # (NT, m, n)
        lt = jnp.transpose(li_ref[0], (2, 0, 1))       # (NT, n, n)
        q_ref[0] = jax.lax.dot_general(
            at, lt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)

    qf = jax.jit(lambda a, li: pl.pallas_call(
        q_kernel, grid=(G,),
        in_specs=[sp(m, n_pad, NT), sp(n_pad, n_pad, NT)],
        out_specs=sp(NT, m, n_pad),
        out_shape=jax.ShapeDtypeStruct((G, NT, m, n_pad), f32),
        compiler_params=cp)(a, li))
    timeit("Q = A Li^T (MXU + transposes)", lambda: qf(A, Gm),
           lambda o: o[:1, :1, :1, :1])

    # ---- stage: Mapply (2 triangular matvecs) -----------------------------
    # 4 applies per solve (1 init + 3 sweeps)
    def map_kernel(li_ref, o_ref):
        lc = li_ref[0]
        v = jnp.ones((n_pad, NT), f32)
        for _ in range(4):
            w1 = jnp.sum(lc * v[None, :, :], axis=1)
            v = jnp.sum(lc * w1[:, None, :], axis=0)
        o_ref[0] = v

    mp = jax.jit(lambda li: pl.pallas_call(
        map_kernel, grid=(G,), in_specs=[sp(n_pad, n_pad, NT)],
        out_specs=sp(n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, NT), f32),
        compiler_params=cp)(li))
    timeit("4x Mapply (8 tri-matvecs)", lambda: mp(Gm),
           lambda o: o[:1, :1, :1])


if __name__ == "__main__":
    main()
