"""TPU perf probe: split GLS chunk time into fused-kernel vs XLA glue.

Runs on the real TPU (axon).  Two measurements:
  1. end-to-end device-complete prepare_interpolator on a tet mesh
     (NINPOL_PROBE_N, default 40 -> 384k cells, 68,921 points);
  2. the fused Pallas kernel alone (gls_solve_fused) on synthetic tiles
     at the same (E, F, B) as the mesh's main interior bucket.

The difference is the XLA prologue (gathers, df32 pieces, tiling) +
dispatch overheads.  Usage:  python tools/perf_probe.py [--kernel-only]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    return np.asarray(x)


def time_dispatches(fn, sync_out, k=5):
    """Enqueue k dispatches, sync once via a dependent fetch of the last
    output (block_until_ready lies through this tunnel)."""
    outs = None
    t0 = time.perf_counter()
    for _ in range(k):
        outs = fn()
    sync(sync_out(outs))
    return (time.perf_counter() - t0) / k


def probe_kernel(E, F, B, with_neumann=False, sweeps=3, rounds=2):
    import jax
    import jax.numpy as jnp
    from ninpol_tpu.ops.pallas_chol import NT, gls_solve_fused as _gsf

    # jit-wrap: untraced calls re-trace the huge unrolled kernel jaxpr
    # on the host every time (seconds of pure python)
    gls_solve_fused = jax.jit(_gsf, static_argnames=("with_neumann",
                                                     "sweeps", "rounds"))

    G = B // NT
    rng = np.random.default_rng(0)
    f32 = jnp.float32

    # packed-input format (see ops/pallas_chol.gls_solve_fused):
    # precomputed df32 piece planes at sublane-padded stride
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

    def run():
        return gls_solve_fused(dkp, fgp, k12, ks, cv, fv, neu, vld,
                               with_neumann, sweeps=sweeps, rounds=rounds)

    t0 = time.perf_counter()
    out = run()
    sync(out[0][:1, :1, :1])
    print(f"  kernel (E={E},F={F},B={B},neu={with_neumann},"
          f"sweeps={sweeps},rounds={rounds}): first call "
          f"{time.perf_counter()-t0:.1f}s", flush=True)
    dt = time_dispatches(run, lambda o: o[0][:1, :1, :1])
    print(f"  kernel steady: {dt*1e3:.1f} ms/chunk = "
          f"{dt/B*1e9:.0f} ns/node -> {B/dt/1e6:.3f} Mnodes/s", flush=True)
    return dt


def main():
    import ninpol_tpu  # noqa: F401  (x64 + compile cache)
    kernel_only = "--kernel-only" in sys.argv

    if not kernel_only:
        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
        from bench import build_problem
        n = int(os.environ.get("NINPOL_PROBE_N", "40"))
        interp, build_time = build_problem(n)
        grid = interp.grid
        print(f"mesh n={n}: {grid.n_elems} cells {grid.n_points} pts "
              f"build {build_time:.2f}s", flush=True)
        tp = np.arange(grid.n_points)
        t0 = time.perf_counter()
        wdev = interp.prepare_interpolator("gls", "u", tp, device_out=True)
        sync(wdev[-1:, -1:])
        print(f"first prepare (compile/cache-load): "
              f"{time.perf_counter()-t0:.1f}s", flush=True)
        for _ in range(3):
            t0 = time.perf_counter()
            wdev = interp.prepare_interpolator("gls", "u", tp,
                                               device_out=True)
            sync(wdev[-1:, -1:])
            dt = time.perf_counter() - t0
            print(f"device-complete: {dt:.3f}s = "
                  f"{dt/grid.n_points*1e9:.0f} ns/node "
                  f"({grid.n_points/dt/1e6:.3f} Mnodes/s)", flush=True)
        # bucket census
        dg = interp.device_grid
        act = ~grid.boundary_points.astype(bool)
        shapes = {}
        for b in dg.buckets(tp, act, chunk_size=16384,
                            chunk_elems=interp.gls.chunk_elems):
            k = (b["E"], b["F"], len(b["pos"]))
            shapes[k] = shapes.get(k, 0) + 1
        print("interior bucket shapes:", shapes, flush=True)
        # production shape = the one covering the most nodes
        E, F, B = max(shapes, key=lambda k: shapes[k] * k[2])

        # full bucket kernel (prologue + fused solve) on one real chunk
        import jax.numpy as jnp
        from ninpol_tpu._methods.gls import _gls_bucket_kernel
        fc = interp.gls._face_cache
        bucket = next(b for b in dg.buckets(
            tp, act, chunk_size=16384,
            chunk_elems=interp.gls.chunk_elems)
            if (b["E"], b["F"], len(b["pos"])) == (E, F, B))
        args = (jnp.asarray(bucket["nodes"]), jnp.asarray(bucket["valid"]),
                dg.esup2d, dg.esup_cnt, dg.fsup2d, dg.fsup_cnt,
                dg.point_pack, dg.cell_pack, *fc)

        def full_chunk():
            return _gls_bucket_kernel(
                *args, E=E, F=F, n_refine=2, exact=False,
                neumann_compat=True, with_neumann=False,
                solver="cholqr", fused=True)

        sync(full_chunk()[0][:1])
        dt = time_dispatches(full_chunk, lambda o: o[0][:1])
        print(f"full bucket kernel (prologue+solve): {dt*1e3:.1f} ms/chunk"
              f" = {dt/B*1e9:.0f} ns/node ({B/dt/1e6:.3f} Mnodes/s)",
              flush=True)

        # ---- packed-gather cost check --------------------------------
        import jax
        (nodes_d, valid_d, esup2d, esup_cnt, fsup2d, fsup_cnt,
         point_pack, cell_pack, face_pack, nflag) = args

        @jax.jit
        def gathers_only(nodes):
            KS = jnp.clip(esup2d[nodes, :E], 0, None)
            SF = jnp.clip(fsup2d[nodes, :F], 0, None)
            return (point_pack[nodes].sum() + cell_pack[KS].sum()
                    + face_pack[SF].sum())

        sync(gathers_only(nodes_d))
        dtg = time_dispatches(lambda: gathers_only(nodes_d),
                              lambda o: o)
        print(f"  packed gathers only: {dtg*1e3:.1f} ms/chunk",
              flush=True)
    else:
        E = int(os.environ.get("KB_E", "24"))
        F = int(os.environ.get("KB_F", "40"))
        B = int(os.environ.get("KB_B", "16384"))

    probe_kernel(E, F, B, with_neumann=False, sweeps=3, rounds=2)
    probe_kernel(E, F, B, with_neumann=False, sweeps=5, rounds=1)


if __name__ == "__main__":
    main()
