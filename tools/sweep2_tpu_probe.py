"""True accuracy + device time of the PURE 2-sweep fused path at 1.9M tets.

The NINPOL_BENCH_REFINE=1 trial showed an exact-fallback storm: the
in-kernel rnorm estimate is the LAST-correction norm, which lags one
sweep — with 2 sweeps it reports the error *before* the final sweep
(~1e-6), tripping the 1e-11 gate on ~94% of nodes.  This probe disables
the gate (fallback_tol=None) and measures the delivered 2-sweep weights
directly against the scipy-dgels oracle at production scale, plus the
device-complete time saved.  If max_rel_err <= 1e-10, a
contraction-ratio-corrected gate (err ~ ||dy2||^2 / (||dy1||*||y||))
makes sweeps=2 shippable.

Usage: python tools/sweep2_tpu_probe.py [N]   (default 68 -> 1.9M cells)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np


def main():
    from bench import build_problem
    from utils.oracle import gls_oracle

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    interp, bt = build_problem(n)
    grid = interp.grid
    print(f"# mesh {grid.n_elems} cells {grid.n_points} points, "
          f"build {bt:.1f}s", flush=True)
    interp.gls.n_refine = 1
    interp.gls.fallback_tol = None      # disable the rnorm gate
    tp = np.arange(grid.n_points)

    t0 = time.perf_counter()
    W, NW = interp.prepare_interpolator("gls", "u", tp)
    print(f"# warm+host prepare: {time.perf_counter() - t0:.2f}s",
          flush=True)

    dts, syncs = [], []
    for _ in range(3):
        t0 = time.perf_counter()
        wdev = interp.prepare_interpolator("gls", "u", tp, device_out=True)
        ts = time.perf_counter()
        _ = np.asarray(wdev[-1:, -1:])
        syncs.append(time.perf_counter() - ts)
        dts.append(time.perf_counter() - t0)
    t_dev = min(dts)
    print(f"# device-complete (2 sweeps, no gate): {t_dev:.3f}s -> "
          f"{grid.n_points / t_dev / 1e6:.3f} Mnodes/s "
          f"(runs {[round(t, 3) for t in dts]}, sync "
          f"{[round(s, 3) for s in syncs]})", flush=True)

    rng = np.random.default_rng(1)
    interior = np.nonzero(~grid.boundary_points.astype(bool))[0]
    sub = rng.choice(interior, min(4096, len(interior)), replace=False)
    v2i = interp.variable_to_index
    Wo, _, cond = gls_oracle(
        grid, sub,
        interp.cells_data[v2i["cells"]["permeability"]],
        interp.cells_data[v2i["cells"]["diff_mag"]],
        interp.points_data[v2i["points"]["neumann_flag_u"]].astype(int),
        interp.points_data[v2i["points"]["neumann_u"]],
        return_cond=True)
    ok = cond < 1e7
    scale = max(np.abs(Wo).max(), 1.0)
    ncols = min(W.shape[1], Wo.shape[1])
    err = float(np.abs(W[sub][ok][:, :ncols] - Wo[ok][:, :ncols]).max()
                / scale)
    print(f"# 2-sweep max rel err vs oracle ({int(ok.sum())}/{len(sub)} "
          f"nodes, cond<1e7, cond max {cond[ok].max():.2e}): {err:.3e}",
        flush=True)


if __name__ == "__main__":
    main()
