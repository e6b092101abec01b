"""Probe: MXU cost vs operand shape for the fused kernel's batched dots.

Hypotheses to test on the real chip (v5e via axon):
  H1 contraction padding: the Gram dot contracts over m; m=132 may pad
     to 2 full 128-deep MXU passes.  Compare m in {128, 132, 136, 168}
     and a SPLIT form (one 128-row dot + one residual-row dot summed).
  H2 lane padding: the dot output/operand minor dim n_pad=80 pads to
     128 lanes.  Compare n_pad in {72, 80, 128}.

Each case: batched per-node dot_general inside one Pallas kernel at
G=128 tiles (16k nodes), MXU layout (NT, m, n), precision HIGHEST,
including the layout transposes the production kernel pays.

Usage: python tools/r5_mxu_shapes.py [G]
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
    from ninpol_tpu.ops.pallas_chol import NT, _VMEM_LIMIT

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    B = G * NT
    f32 = jnp.float32
    _HI = jax.lax.Precision.HIGHEST
    rng = np.random.default_rng(0)

    sp = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (i * 0,) * len(dims),
        memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=_VMEM_LIMIT)

    def timeit(name, fn, sync_slice):
        t0 = time.perf_counter()
        out = fn()
        np.asarray(sync_slice(out))
        print(f"  {name}: first {time.perf_counter()-t0:.1f}s", flush=True)
        k = 5
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        np.asarray(sync_slice(out))
        dt = (time.perf_counter() - t0) / k
        print(f"{name}: {dt*1e3:.2f} ms = {dt/B*1e9:.0f} ns/node",
              flush=True)
        return dt

    def gram_case(m, n, split=0):
        """Gram dot at (m, n), VPU-layout input (m, n, NT) incl. the
        transpose in; split>0 sums dots over rows [0:split] and
        [split:m]."""
        A = jnp.asarray(rng.standard_normal((G, m, n, NT)) * 0.1, f32)

        def kern(a_ref, o_ref):
            at = jnp.transpose(a_ref[0], (2, 0, 1))     # (NT, m, n)
            if split:
                g = jax.lax.dot_general(
                    at[:, :split, :], at[:, :split, :],
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32, precision=_HI)
                g = g + jax.lax.dot_general(
                    at[:, split:, :], at[:, split:, :],
                    (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32, precision=_HI)
            else:
                g = jax.lax.dot_general(
                    at, at, (((1,), (1,)), ((0,), (0,))),
                    preferred_element_type=f32, precision=_HI)
            o_ref[0] = jnp.transpose(g, (1, 2, 0))

        fn = jax.jit(lambda a: pl.pallas_call(
            kern, grid=(G,), in_specs=[sp(m, n, NT)],
            out_specs=sp(n, n, NT),
            out_shape=jax.ShapeDtypeStruct((G, n, n, NT), f32),
            compiler_params=cp)(a))
        tag = f"gram m={m} n={n}" + (f" split@{split}" if split else "")
        return timeit(tag, lambda: fn(A), lambda o: o[:1, :1, :1, :1])

    # H1: contraction padding over m (production n_pad=80)
    for m in (128, 132, 136, 168):
        gram_case(m, 80)
    gram_case(132, 80, split=128)

    # H2: lane padding over n at fixed m=132
    for n in (72, 128):
        gram_case(132, n)


if __name__ == "__main__":
    main()
