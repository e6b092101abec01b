"""Convergence-order post-processing of accuracy/performance results.

Analogue of the reference's tests/results/graph.py (367 LoC of
YAML->CSV/PNG plotting): reads performance.json / accuracy runs and emits
CSV tables with the convergence order
    Ru = -3 * d log(err) / d log(n_cells)
(reference graph.py:77,106-112; expected ~2 for GLS/LS).  Plotting is
text/CSV only (no display in this environment).
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


def main(path=None):
    here = os.path.dirname(os.path.abspath(__file__))
    path = path or os.path.join(here, "performance.json")
    with open(path) as f:
        results = json.load(f)

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
                    row += [f"{md['time'][i]:.4f}", f"{md['error'][i]:.6e}",
                            f"{rus[m][i]:.3f}"]
                f.write(",".join(row) + "\n")
        print("wrote", csv_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
