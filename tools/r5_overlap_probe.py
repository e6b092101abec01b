"""Probe: does Mosaic overlap pallas input-block DMA with compute?

Three kernels over the production input block set (9 inputs,
~700 KB/step):
  A  trivial body                      -> ~pure DMA floor
  B  ~40 us of dummy VPU work, inputs
     UNTOUCHED by the work             -> max(DMA, compute) if
                                          double-buffered, sum if not
  C  the same dummy work but seeded
     from an input value               -> adds a data dependency

Usage: python tools/r5_overlap_probe.py [G]
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
    Fp, Ep = 40, 24
    B = G * NT
    f32 = jnp.float32
    rng = np.random.default_rng(0)
    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=_VMEM_LIMIT)

    def sp(*dims):
        return pl.BlockSpec((1,) + dims,
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
        (G, 6, NT), (G, 6 * Ep, NT), (G, 28 * Fp, NT), (G, 2 * Fp, NT),
        (G, E, NT), (G, E, NT), (G, F, NT), (G, 1, NT), (G, 1, NT)]]
    in_specs = [sp(6, NT), sp(6 * Ep, NT), sp(28 * Fp, NT),
                sp(2 * Fp, NT), sp(E, NT), sp(E, NT), sp(F, NT),
                sp(1, NT), sp(1, NT)]
    out_specs = [sp(E, NT), sp(1, NT)]
    out_shape = [jax.ShapeDtypeStruct((G, E, NT), f32),
                 jax.ShapeDtypeStruct((G, 1, NT), f32)]

    def touch(refs):
        return (refs[2][0][:1] + refs[0][0][:1] + refs[1][0][:1]
                + refs[3][0][:1] + refs[4][0][:1] + refs[5][0][:1]
                + refs[6][0][:1] + refs[7][0] + refs[8][0])  # (1, NT)

    def dummy_work(seed, iters=60):
        # ~iters x (E, n, NT)-ish vector ops with a serial dependency
        acc = jnp.broadcast_to(seed, (E, 128, NT)) * f32(1e-6)
        x = acc
        for _ in range(iters):
            x = x * f32(0.999) + acc
        return jnp.sum(x, axis=1)  # (E, NT)

    def body_a(*refs):
        w, r = refs[-2], refs[-1]
        red = touch(refs[:-2])
        w[0] = jnp.broadcast_to(red, (E, NT))
        r[0] = red

    def body_b(*refs):
        w, r = refs[-2], refs[-1]
        red = touch(refs[:-2])
        w[0] = dummy_work(jnp.ones((1, 1, NT), f32))
        r[0] = red

    def body_c(*refs):
        w, r = refs[-2], refs[-1]
        red = touch(refs[:-2])
        w[0] = dummy_work(red[None, :1, :])
        r[0] = red

    for name, body in (("A trivial", body_a), ("B dummy-indep", body_b),
                       ("C dummy-dep", body_c)):
        f = jax.jit(lambda *a, _b=body: pl.pallas_call(
            _b, grid=(G,), in_specs=in_specs, out_specs=out_specs,
            out_shape=out_shape, compiler_params=cp)(*a))
        timeit(name, lambda: f(*ins), lambda o: o[0][:1, :1, :1])


if __name__ == "__main__":
    main()
