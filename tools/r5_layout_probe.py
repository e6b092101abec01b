"""Probe: input block LAYOUT vs streaming cost, full consumption.

The fused kernel's inputs stream at ~15 GB/s effective (round-5 floor
probe) — 30x under HBM speed.  Each case reads one fpk-sized input
(28*F rows of NT lanes per tile-step) shaped differently, fully
reduces it (no DCE), and writes a tiny output.

Usage: python tools/r5_layout_probe.py [G]
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
    F = 36
    R = 28 * F                        # 1008 rows per tile-step
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
        gbs = (G * R * NT * 4) / dt / 1e9
        print(f"{name}: {dt*1e3:.2f} ms = {dt/B*1e9:.0f} ns/node "
              f"({gbs:.0f} GB/s)", flush=True)

    def sp(*dims):
        return pl.BlockSpec((1,) + dims,
                            (lambda i: (i,) + (i * 0,) * len(dims)),
                            memory_space=pltpu.VMEM)

    # A: 4-D (1, 28, F, NT) — production fpk layout
    xa = jnp.asarray(rng.standard_normal((G, 28, F, NT)), f32)

    def body_a(x, o):
        o[0] = jnp.sum(x[0], axis=(0, 1))[None, :]

    fa = jax.jit(lambda x: pl.pallas_call(
        body_a, grid=(G,), in_specs=[sp(28, F, NT)], out_specs=sp(1, NT),
        out_shape=jax.ShapeDtypeStruct((G, 1, NT), f32),
        compiler_params=cp)(x))
    timeit("A 4-D (28,F,NT)", lambda: fa(xa), lambda o: o[:1, :1, :1])

    # B: 3-D flat (1, 28*F, NT)
    xb = jnp.asarray(rng.standard_normal((G, R, NT)), f32)

    def body_b(x, o):
        o[0] = jnp.sum(x[0], axis=0)[None, :]

    fb = jax.jit(lambda x: pl.pallas_call(
        body_b, grid=(G,), in_specs=[sp(R, NT)], out_specs=sp(1, NT),
        out_shape=jax.ShapeDtypeStruct((G, 1, NT), f32),
        compiler_params=cp)(x))
    timeit("B 3-D (28F,NT)", lambda: fb(xb), lambda o: o[:1, :1, :1])

    # C: 3-D flat, block split over G=2 grid dims? no — C: wider lanes
    # (1, R//4, 4*NT): same bytes, 4x wider rows
    xc = jnp.asarray(rng.standard_normal((G, R // 4, 4 * NT)), f32)

    def body_c(x, o):
        o[0] = jnp.sum(x[0], axis=0)[None, :NT]

    fc = jax.jit(lambda x: pl.pallas_call(
        body_c, grid=(G,), in_specs=[sp(R // 4, 4 * NT)],
        out_specs=sp(1, NT),
        out_shape=jax.ShapeDtypeStruct((G, 1, NT), f32),
        compiler_params=cp)(x))
    timeit("C 3-D (R/4,4NT)", lambda: fc(xc), lambda o: o[:1, :1, :1])

    # D: whole array resident in VMEM via memory_space=ANY + manual? No —
    # D: no grid: one step, full (G*R? too big) — instead 8 tiles/step
    xd = xb
    G8 = G // 8

    def body_d(x, o):
        for t in range(8):
            o[t] = jnp.sum(x[t], axis=0)[None, :]

    spd = pl.BlockSpec((8, R, NT), lambda i: (i, i * 0, i * 0),
                       memory_space=pltpu.VMEM)
    spo = pl.BlockSpec((8, 1, NT), lambda i: (i, i * 0, i * 0),
                       memory_space=pltpu.VMEM)
    fd = jax.jit(lambda x: pl.pallas_call(
        body_d, grid=(G8,), in_specs=[spd], out_specs=spo,
        out_shape=jax.ShapeDtypeStruct((G, 1, NT), f32),
        compiler_params=cp)(x))
    timeit("D 8-tile steps", lambda: fd(xd), lambda o: o[:1, :1, :1])


if __name__ == "__main__":
    main()
