"""Result post-processing: convergence-order CSVs + PNG figures.

Analogue of the reference's tests/results/graph.py (367 LoC): from
performance.json it emits
  * build_times.png            — grid-build time vs N per family
                                 (reference graph.py "build_times.png"),
  * ALH_<family>.png           — 1x2 time/memory vs N per family, one
                                 line per method, log-log (reference's
                                 {case}_{mtype}.png),
  * convergence_<family>.csv   — error + convergence order
                                 Ru = -3 d log(err) / d log(n_cells)
                                 per method (reference graph.py:77,
                                 106-112; expected ~2 for GLS/LS).

Run:  python tests/results/graph.py [performance.json path]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np


def convergence_orders(sizes, errors):
    sizes = np.asarray(sizes, dtype=float)
    errors = np.asarray(errors, dtype=float)
    out = [np.nan]
    for i in range(1, len(sizes)):
        out.append(-3.0 * (np.log(errors[i]) - np.log(errors[i - 1]))
                   / (np.log(sizes[i]) - np.log(sizes[i - 1])))
    return out


def write_csvs(results, here):
    for fam, data in results.items():
        if not isinstance(data, dict) or "sizes" not in data:
            continue
        csv_path = os.path.join(here, f"convergence_{fam}.csv")
        with open(csv_path, "w") as f:
            methods = sorted(data["methods"])
            header = ["n_cells", "n_points", "build_s"]
            for m in methods:
                header += [f"{m}_time_s", f"{m}_err", f"{m}_Ru"]
            f.write(",".join(header) + "\n")
            rus = {m: convergence_orders(data["sizes"],
                                         data["methods"][m]["error"])
                   for m in methods}
            for i, (nc, npts, b) in enumerate(zip(
                    data["sizes"], data["points"], data["build"])):
                row = [str(nc), str(npts), f"{b:.4f}"]
                for m in methods:
                    md = data["methods"][m]
                    row += [f"{md['time'][i]:.4f}",
                            f"{md['error'][i]:.6e}",
                            f"{rus[m][i]:.3f}"]
                f.write(",".join(row) + "\n")
        print("wrote", csv_path)


def write_figures(results, here, case_name="ALH"):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fams = [f for f, d in results.items()
            if isinstance(d, dict) and "sizes" in d]
    if not fams:
        return

    # build_times.png: build time vs N for each family
    fig, ax = plt.subplots(figsize=(6, 4))
    for fam in fams:
        d = results[fam]
        ax.loglog(d["points"], d["build"], "o-", label=fam)
    ax.set_xlabel("n_points")
    ax.set_ylabel("grid build time [s]")
    ax.set_title("Grid build")
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    path = os.path.join(here, "build_times.png")
    fig.savefig(path, dpi=120)
    plt.close(fig)
    print("wrote", path)

    # per-family 1x2 time/memory figures, one line per method
    for fam in fams:
        d = results[fam]
        fig, (axt, axm) = plt.subplots(1, 2, figsize=(10, 4))
        for m in sorted(d["methods"]):
            md = d["methods"][m]
            axt.loglog(d["points"], md["time"], "o-", label=m)
            mem = [v for v in md.get("memory", []) if v is not None]
            if len(mem) == len(d["points"]):
                axm.loglog(d["points"], mem, "o-", label=m)
        axt.set_xlabel("n_points")
        axt.set_ylabel("interpolate time [s]")
        axt.set_title(f"{case_name} {fam}: time")
        axt.grid(True, which="both", alpha=0.3)
        axt.legend()
        axm.set_xlabel("n_points")
        axm.set_ylabel("peak RSS [MB]")
        axm.set_title(f"{case_name} {fam}: memory")
        axm.grid(True, which="both", alpha=0.3)
        if axm.lines:
            axm.legend()
        fig.tight_layout()
        path = os.path.join(here, f"{case_name}_{fam}.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        print("wrote", path)


def main(path=None):
    here = os.path.dirname(os.path.abspath(__file__))
    path = path or os.path.join(here, "performance.json")
    with open(path) as f:
        results = json.load(f)
    write_csvs(results, here)
    try:
        write_figures(results, here)
    except Exception as e:  # keep CSVs even without a working matplotlib
        print("figure generation skipped:", e)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
