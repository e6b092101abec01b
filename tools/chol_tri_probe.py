"""A/B probe: triangular-restricted Cholesky + inverse rows (tri=True)
vs the full-rectangle VPU baseline (ops/pallas_chol._chol_panels /
_linv_rows).

The baseline's right-looking trailing update and inverse-row folds run
over full (col, row) rectangles although only the lower triangle is
live — roughly 2x the necessary VPU flops.  tri=True restricts every
pass to the triangle at 8-row granularity (all slices stay
sublane-aligned).  The skipped work only ever touched above-diagonal
garbage, so the LOWER TRIANGLE of L^{-1} must be BITWISE identical.

Usage: python tools/chol_tri_probe.py [G] (default 128 tiles = 16k nodes)
CPU check: env PYTHONPATH= JAX_PLATFORMS=cpu python tools/chol_tri_probe.py 2 --interpret
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
    from ninpol_tpu.ops.pallas_chol import (
        NT, _VMEM_LIMIT, _chol_panels, _linv_rows)

    interpret = "--interpret" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    G = int(args[0]) if args else 128
    E = 24
    n = 3 * E + 1
    n_pad = -(-n // 8) * 8
    f32 = jnp.float32
    B = G * NT

    rng = np.random.default_rng(0)
    Gm = jnp.asarray(
        np.broadcast_to(np.eye(n_pad)[None, :, :, None] * 4.0,
                        (G, n_pad, n_pad, NT))
        + rng.standard_normal((G, n_pad, n_pad, NT)) * 0.02, f32)

    sp = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (i * 0,) * len(dims),
        memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=_VMEM_LIMIT)

    def make(tri):
        def kern(g_ref, li_ref, g_scr):
            g_scr[:] = g_ref[0]
            dinvs = _chol_panels(g_scr, n_pad, 1e-12, tri=tri)
            _linv_rows(g_scr, li_ref.at[0], n_pad, dinvs, tri=tri)
        return jax.jit(lambda g: pl.pallas_call(
            kern, grid=(G,), in_specs=[sp(n_pad, n_pad, NT)],
            out_specs=sp(n_pad, n_pad, NT),
            out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
            scratch_shapes=[pltpu.VMEM((n_pad, n_pad, NT), f32)],
            compiler_params=cp, interpret=interpret)(g))

    def timeit(name, fn):
        try:
            out = fn(Gm)
            np.asarray(out[:1, :1, :1, :1])
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:400]}",
                  flush=True)
            return None, None
        t0 = time.perf_counter()
        k = 1 if interpret else 10
        for _ in range(k):
            out = fn(Gm)
        np.asarray(out[:1, :1, :1, :1])
        dt = (time.perf_counter() - t0) / k
        print(f"{name}: {dt*1e3:.2f} ms for {B} nodes = "
              f"{dt/B*1e9:.0f} ns/node", flush=True)
        return dt, out

    _, ref = timeit("chol+linv VPU baseline (tri=False)", make(False))
    _, out = timeit("chol+linv triangular  (tri=True) ", make(True))
    if ref is not None and out is not None:
        # li planes are ROW planes: li[k, c, :] = Linv[k, c]; live
        # entries are c <= k (lower triangle of Linv)
        refh, outh = np.asarray(ref), np.asarray(out)
        live = (np.arange(n_pad)[:, None] >= np.arange(n_pad)[None, :])
        m = live[None, :, :, None]
        d = np.abs(np.where(m, refh - outh, 0.0))
        tail = np.abs(np.where(m, 0.0, outh))
        print(f"  max |dLi| (lower tri, must be 0): {d.max():.3e}")
        print(f"  max |Li tail| (above diag, must be 0): {tail.max():.3e}")


if __name__ == "__main__":
    main()
