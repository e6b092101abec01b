"""Round-5 stage attribution of the fused GLS solve kernel on real TPU.

Times the PRODUCTION kernel (gls_solve_fused) at the bench's dominant
interior class (E=24, F=36, with_neumann=False, B=16384) against
probe-stop variants, so marginal differences attribute time to stages:

  full(s3)           sweeps=3, rounds=2            (production)
  full(s2)           sweeps=2                      -> per-sweep cost
  precond            stop after CholQR2 build      -> sweeps+extract
  assembly           stop after S-masks+assembly   -> precond stages
  (more stops: noop/prologue/gram1/chol1/q/gram2 — see CONFIGS.
   CAVEAT: stops before heavy compute read max(input-DMA, compute);
   only the full-kernel configs are DMA-unmasked ground truth.)

Usage: python tools/r5_attrib.py [B] [configs...]
  configs default: s3 s2 precond asm
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import ninpol_tpu  # noqa: F401  (x64 + compile cache)
    import jax
    import jax.numpy as jnp
    from ninpol_tpu.ops.pallas_chol import NT, gls_solve_fused as _gsf

    gsf = jax.jit(_gsf, static_argnames=(
        "with_neumann", "sweeps", "rounds", "probe_stop"))

    E, F = 24, 36
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    configs = sys.argv[2:] or ["s3", "s2", "precond", "asm"]
    G = B // NT
    rng = np.random.default_rng(0)
    f32 = jnp.float32

    Fp = -(-F // 8) * 8
    Ep = -(-E // 8) * 8
    dkp = jnp.asarray(rng.standard_normal((G, 6 * Ep, NT)), f32)
    fgp = jnp.asarray(rng.standard_normal((G, 32 * Fp, NT)) * 0.3, f32)
    k12np = np.zeros((G, 2 * Fp, NT), np.int32)
    k12np[:, :F] = rng.integers(0, E, (G, F, NT))
    k12np[:, Fp:Fp + F] = rng.integers(0, E, (G, F, NT))
    k12 = jnp.asarray(k12np)
    ks = jnp.asarray(
        np.broadcast_to(np.arange(E, dtype=np.int32)[None, :, None],
                        (G, E, NT)).copy())
    cv = jnp.ones((G, E, NT), f32)
    fv = jnp.ones((G, F, NT), f32)
    neu = jnp.zeros((G, 1, NT), f32)
    vld = jnp.ones((G, 1, NT), f32)
    args = (dkp, fgp, k12, ks, cv, fv, neu, vld)

    CONFIGS = {
        "s3": dict(sweeps=3, rounds=2),
        "s2": dict(sweeps=2, rounds=2),
        "s1": dict(sweeps=1, rounds=2),
        "precond": dict(sweeps=3, rounds=2, probe_stop="precond"),
        "asm": dict(sweeps=3, rounds=2, probe_stop="assembly"),
        "noop": dict(sweeps=3, rounds=2, probe_stop="noop"),
        "prologue": dict(sweeps=3, rounds=2, probe_stop="prologue"),
        "gram1": dict(sweeps=3, rounds=2, probe_stop="gram1"),
        "chol1": dict(sweeps=3, rounds=2, probe_stop="chol1"),
        "q": dict(sweeps=3, rounds=2, probe_stop="q"),
        "gram2": dict(sweeps=3, rounds=2, probe_stop="gram2"),
        "r1": dict(sweeps=5, rounds=1),
        "precond_r1": dict(sweeps=5, rounds=1, probe_stop="precond"),
    }

    results = {}
    for name in configs:
        kw = CONFIGS[name]

        def run():
            return gsf(*args, False, **kw)

        t0 = time.perf_counter()
        out = run()
        np.asarray(out[0][:1, :1, :1])
        print(f"{name}: first call {time.perf_counter()-t0:.1f}s",
              flush=True)
        k = 5
        t0 = time.perf_counter()
        for _ in range(k):
            out = run()
        np.asarray(out[0][:1, :1, :1])
        dt = (time.perf_counter() - t0) / k
        results[name] = dt
        print(f"{name}: {dt*1e3:.2f} ms/chunk = {dt/B*1e9:.0f} ns/node",
              flush=True)

    def diff(a, b, label):
        if a in results and b in results:
            d = (results[a] - results[b]) / B * 1e9
            print(f"{label}: {d:.0f} ns/node", flush=True)

    print("---- attribution ----")
    diff("s3", "s2", "one sweep (mul_G + Mapply)")
    diff("s3", "precond", "sweeps + extract total")
    diff("precond", "asm", "precond build (gram1+chol+linv+Q+gram2+chol2)")
    diff("asm", "prologue", "assembly writes")
    diff("gram1", "asm", "D-normalize + transpose + gram1 MXU")
    diff("chol1", "gram1", "chol1 + linv1 (tri)")
    diff("q", "chol1", "Q = A Li1^T MXU")
    diff("gram2", "q", "gram2 MXU")
    diff("precond", "gram2", "chol2 + lm/d2stk/dmax")
    if "asm" in results:
        print(f"prologue+assembly: {results['asm']/B*1e9:.0f} ns/node",
              flush=True)


if __name__ == "__main__":
    main()
