"""Performance harness: build + interpolate timings across refinement
levels and methods, with peak-RSS tracking.

Rebuild of the reference harness (tests/performance_test.py:52-262): the
reference times load_mesh and each method over n_repeats and polls a fresh
subprocess's RSS; here timings run in-process (JAX owns the device) and
peak RSS comes from resource.getrusage.  Results are written as YAML-ish
JSON under tests/results/.

Run directly:  python tests/performance_harness.py [--families hexa,tetra]
                [--levels 8,16,32] [--methods idw,ls,gls] [--repeats 3]
"""
from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def peak_rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def run(families, levels, methods, repeats, case_name="ALH", seed=0):
    from ninpol_tpu.interpolator import Interpolator
    from ninpol_tpu.utils import meshgen
    from utils.cases import ALHCase, LINCase, QUADCase, FANCase

    case_cls = {"ALH": ALHCase, "LIN": LINCase, "QUAD": QUADCase,
                "FAN": FANCase}[case_name]
    results = {}
    for fam in families:
        results[fam] = {"sizes": [], "points": [], "build": [],
                        "methods": {m: {"time": [], "error": []}
                                    for m in methods}}
        for n in levels:
            case = case_cls()
            case.assign_mesh_properties(meshgen.FAMILIES[fam](n), seed=seed)
            interp = Interpolator()
            t0 = time.perf_counter()
            interp.load_mesh(mesh_obj=case.mesh)
            build = time.perf_counter() - t0
            grid = interp.grid
            results[fam]["sizes"].append(grid.n_elems)
            results[fam]["points"].append(grid.n_points)
            results[fam]["build"].append(round(build, 4))
            print(f"[{fam} n={n}] {grid.n_elems} cells "
                  f"{grid.n_points} pts build {build:.2f}s", flush=True)
            for m in methods:
                interp.interpolate(case.name, m)  # warmup/compile
                times = []
                for _ in range(repeats):
                    # honest repeats: defeat the prepared-weights cache
                    interp._prep_cache = {}
                    t0 = time.perf_counter()
                    W, _ = interp.interpolate(case.name, m)
                    times.append(time.perf_counter() - t0)
                err = case.evaluate(W)
                results[fam]["methods"][m]["time"].append(
                    round(min(times), 4))
                results[fam]["methods"][m]["error"].append(float(err))
                print(f"    {m}: {min(times):.3f}s err={err:.3e}",
                      flush=True)
        results[fam]["peak_rss_mb"] = round(peak_rss_mb(), 1)
    results["peak_rss_mb"] = round(peak_rss_mb(), 1)
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default="hexa,tetra,prism")
    ap.add_argument("--levels", default="8,16")
    ap.add_argument("--methods", default="idw,ls,gls")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--case", default="ALH")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    results = run(args.families.split(","),
                  [int(x) for x in args.levels.split(",")],
                  args.methods.split(","), args.repeats, args.case)
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "results",
        "performance.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", out)


if __name__ == "__main__":
    main()
