"""Attribute device-complete GLS time: interior-only vs full node set.

Runs prepare_interpolator(device_out=True) at 1.9M tets three ways —
all nodes, interior-only, boundary-only — with a dependent 1-element
fetch as the sync.  Canonical bucket ladders mean the subsets hit the
same compiled programs.  Answers how much of the ~3.4 us/node
end-to-end rate is the Neumann bucket + how much the interior path
itself costs outside the fused kernel (~1.88 us/node at (24,36,16k)).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import build_problem

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    interp, bt = build_problem(n)
    grid = interp.grid
    print(f"# mesh {grid.n_elems} cells {grid.n_points} points, "
          f"build {bt:.1f}s", flush=True)
    boundary = grid.boundary_points.astype(bool)
    subsets = {
        "all": np.arange(grid.n_points),
        "interior": np.nonzero(~boundary)[0],
        "boundary": np.nonzero(boundary)[0],
    }
    for name, tp in subsets.items():
        # warm (compiles/loads + caches), then 3 timed runs
        interp._prep_cache.clear()
        wdev = interp.prepare_interpolator("gls", "u", tp,
                                           device_out=True)
        _ = np.asarray(wdev[-1:, -1:])
        dts = []
        for _ in range(3):
            interp._prep_cache.clear()
            t0 = time.perf_counter()
            wdev = interp.prepare_interpolator("gls", "u", tp,
                                               device_out=True)
            _ = np.asarray(wdev[-1:, -1:])
            dts.append(time.perf_counter() - t0)
        t = min(dts)
        print(f"# {name}: {len(tp)} nodes, {t:.3f}s -> "
              f"{t / len(tp) * 1e6:.2f} us/node "
              f"(runs {[round(x, 3) for x in dts]})", flush=True)


if __name__ == "__main__":
    main()
