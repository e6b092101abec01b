"""Per-program device-time attribution for a 1.9M-tet GLS prepare.

Monkeypatches the GLS dispatch entries (_gls_bucket_scan,
_gls_bucket_kernel, _consolidate_device) to insert a dependent
1-element fetch after each call, serializing the pipeline so each
program's device time is visible.  Every sync adds the relay's ~70 ms
round-trip, so compare the per-unit numbers to each other and to the
unserialized total, not to wall clock.

Usage: python tools/unit_times_probe.py [n]   (default 68 -> 1.9M tets)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from bench import build_problem
    from ninpol_tpu._methods import gls as gls_mod

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    interp, bt = build_problem(n)
    tp = np.arange(interp.grid.n_points)
    print(f"# mesh {interp.grid.n_elems} cells {interp.grid.n_points} "
          f"points, build {bt:.1f}s", flush=True)

    # warm everything (compiles + executable loads + plan caches)
    wdev = interp.prepare_interpolator("gls", "u", tp, device_out=True)
    _ = np.asarray(wdev[-1:, -1:])

    # unserialized baseline
    times = []
    for _ in range(2):
        interp._prep_cache.clear()
        t0 = time.perf_counter()
        wdev = interp.prepare_interpolator("gls", "u", tp, device_out=True)
        _ = np.asarray(wdev[-1:, -1:])
        times.append(time.perf_counter() - t0)
    print(f"# unserialized total: {min(times):.3f}s (runs "
          f"{[round(t, 3) for t in times]})", flush=True)

    # Record every dispatch's (fn, args, kwargs) during a prepare (the
    # preload thread pool launches them concurrently, so in-place timing
    # is useless), then REPLAY each program alone with a dependent fetch.
    calls = []

    def record(name, orig, sync):
        def wrapper(*a, **k):
            calls.append((name(*a, **k), orig, a, k, sync))
            return orig(*a, **k)
        return wrapper

    orig_scan = gls_mod._gls_bucket_scan
    orig_single = gls_mod._gls_bucket_kernel
    orig_cons = gls_mod._consolidate_device
    orig_tscan = gls_mod._gls_solve_tiles_scan
    orig_tsingle = gls_mod._gls_solve_tiles_j
    orig_gscan = gls_mod._gls_gather_scan
    orig_gsingle = gls_mod._gls_gather_j

    def tiles_shape(tiles):
        # fp tile (G[,S], 28, F, NT): recover (S*)B and F
        fp = tiles[2]
        nt = fp.shape[-1]
        g = fp.shape[0] * (fp.shape[1] if fp.ndim == 5 else 1)
        return (g * nt, fp.shape[-2])

    gls_mod._gls_bucket_scan = record(
        lambda nodes_s, *a, **k: ("scan", tuple(nodes_s.shape),
                                  k.get("E"), k.get("F"),
                                  k.get("with_neumann")),
        orig_scan, lambda r: np.asarray(r[2][-1:]))
    gls_mod._gls_bucket_kernel = record(
        lambda nodes, *a, **k: ("single", tuple(nodes.shape),
                                k.get("E"), k.get("F"),
                                k.get("with_neumann"), k.get("exact")),
        orig_single, lambda r: np.asarray(r[2][-1:]))
    gls_mod._gls_solve_tiles_scan = record(
        lambda tiles, **k: ("solve_scan",) + tiles_shape(tiles)
        + (k.get("with_neumann"),),
        orig_tscan, lambda r: np.asarray(r[2][-1:]))
    gls_mod._gls_solve_tiles_j = record(
        lambda tiles, **k: ("solve_single",) + tiles_shape(tiles)
        + (k.get("with_neumann"),),
        orig_tsingle, lambda r: np.asarray(r[2][-1:]))
    gls_mod._gls_gather_scan = record(
        lambda ns, *a, **k: ("gather_scan", tuple(ns.shape),
                             k.get("E"), k.get("F")),
        orig_gscan, lambda r: np.asarray(r[0][-1:, -1:, -1:, -1:]))
    gls_mod._gls_gather_j = record(
        lambda nd, *a, **k: ("gather_single", tuple(nd.shape),
                             k.get("E"), k.get("F")),
        orig_gsingle, lambda r: np.asarray(r[0][-1:, -1:, -1:]))
    gls_mod._consolidate_device = record(
        lambda *a, **k: ("consolidate", k.get("n_target")),
        orig_cons, lambda r: np.asarray(r[0][-1:, -1:]))
    try:
        interp._prep_cache.clear()
        wdev = interp.prepare_interpolator("gls", "u", tp, device_out=True)
        _ = np.asarray(wdev[-1:, -1:])
    finally:
        gls_mod._gls_bucket_scan = orig_scan
        gls_mod._gls_bucket_kernel = orig_single
        gls_mod._consolidate_device = orig_cons
        gls_mod._gls_solve_tiles_scan = orig_tscan
        gls_mod._gls_solve_tiles_j = orig_tsingle
        gls_mod._gls_gather_scan = orig_gscan
        gls_mod._gls_gather_j = orig_gsingle

    # dedupe (preload + launch loop may both call the first of a class)
    seen, replay = set(), []
    for sig, orig, a, k, sync in calls:
        key = (sig, tuple(id(x) for x in a))
        if key in seen:
            continue
        seen.add(key)
        replay.append((sig, orig, a, k, sync))

    print(f"# replaying {len(replay)} programs, each alone with a "
          "dependent fetch (~70 ms relay round-trip included):",
          flush=True)
    for sig, orig, a, k, sync in replay:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            sync(orig(*a, **k))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        npos = sig[1][0] * sig[1][1] if sig[0] == "scan" else 0
        rate = f"  {best / npos * 1e6:6.2f} us/slot" if npos else ""
        print(f"#   {best:8.3f}s  {sig}{rate}", flush=True)


if __name__ == "__main__":
    main()
