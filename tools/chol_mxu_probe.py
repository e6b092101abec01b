"""A/B probe: MXU left-looking super-panel Cholesky + inverse rows vs
the all-VPU right-looking baseline (ops/pallas_chol._chol_panels /
_linv_rows with and without the lt/limx scratches).

Times, per variant, ONE kernel that runs chol + linv on synthetic SPD
tiles at the production shape (E=24, F=40 -> n_pad=80), exactly like
tools/kernel_stages.py's "chol panels + linv rows" stage, and checks the
MXU variants' L^{-1} against the baseline (the summation ORDER differs,
so agreement is ~1e-5 relative on well-conditioned tiles, not bitwise).

Usage: python tools/chol_mxu_probe.py [G] (default 128 tiles = 16k nodes)
CPU check only: env PYTHONPATH= JAX_PLATFORMS=cpu python tools/chol_mxu_probe.py 2 --interpret
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
    from ninpol_tpu.ops import pallas_chol as pc
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

    def make(sup):
        """sup=None -> baseline (no MXU scratches)."""
        if sup is None:
            def kern(g_ref, li_ref, g_scr):
                g_scr[:] = g_ref[0]
                dinvs = _chol_panels(g_scr, n_pad, 1e-12)
                _linv_rows(g_scr, li_ref.at[0], n_pad, dinvs)
            scr = [pltpu.VMEM((n_pad, n_pad, NT), f32)]
        else:
            def kern(g_ref, li_ref, g_scr, lt_scr, limx_scr):
                g_scr[:] = g_ref[0]
                dinvs = _chol_panels(g_scr, n_pad, 1e-12,
                                     lt_scr=lt_scr, sup=sup)
                _linv_rows(g_scr, li_ref.at[0], n_pad, dinvs,
                           limx_scr=limx_scr, sup=sup)
            scr = [pltpu.VMEM((n_pad, n_pad, NT), f32),
                   pltpu.VMEM((NT, n_pad, n_pad), f32),
                   pltpu.VMEM((NT, n_pad, n_pad), f32)]
        return jax.jit(lambda g: pl.pallas_call(
            kern, grid=(G,), in_specs=[sp(n_pad, n_pad, NT)],
            out_specs=sp(n_pad, n_pad, NT),
            out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
            scratch_shapes=scr,
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

    _, ref = timeit("chol+linv VPU baseline", make(None))
    refh = np.asarray(ref) if ref is not None else None
    tril = np.tril(np.ones((n_pad, n_pad), bool))[None, :, :, None]
    for sup in (8, 16, 32, 48):
        _, out = timeit(f"chol+linv MXU sup={sup}", make(sup))
        if out is not None and refh is not None:
            d = np.abs(np.asarray(out) - refh)[tril.repeat(G, 0)
                                               .repeat(NT, -1)
                                               .reshape(G, n_pad, n_pad, NT)]
            scale = np.abs(refh).max()
            print(f"  max |dLi| vs baseline (lower tri): "
                  f"{d.max():.3e} (scale {scale:.2e})", flush=True)


if __name__ == "__main__":
    main()
