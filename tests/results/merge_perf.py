"""Merge per-family perf harness outputs into performance.json and print
a reference-comparison table (reference numbers: BASELINE.md)."""
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

# reference (Cython, <=16 threads) largest-mesh rows from BASELINE.md
REF = {
    "hexa": {"cells": 2097152, "build": 7.312,
             "gls": 6.201, "idw": 0.428, "ls": 0.460, "rss_mb": 3217},
    "tetra": {"cells": 1950720, "build": 5.463,
              "gls": 14.325, "idw": 0.182, "ls": 0.176},
    "prism": {"cells": 1024000, "build": 3.086,
              "gls": 2.416, "idw": 0.110, "ls": 0.127},
}


def main():
    merged = {}
    for fam in ("hexa", "tetra", "prism"):
        path = os.path.join(HERE, f"perf_{fam}.json")
        if not os.path.exists(path):
            print(f"missing {path}", file=sys.stderr)
            continue
        with open(path) as f:
            merged.update({k: v for k, v in json.load(f).items()
                           if k != "peak_rss_mb"})
    out = os.path.join(HERE, "performance.json")
    with open(out, "w") as f:
        json.dump(merged, f, indent=2)
    print(f"wrote {out}")

    print(f"\n{'family':<7}{'cells':>9}{'build s':>9}{'gls s':>8}"
          f"{'idw s':>8}{'ls s':>8}{'rss MB':>9}   (reference at its "
          "largest mesh in parens)")
    for fam, r in REF.items():
        if fam not in merged:
            continue
        d = merged[fam]
        i = -1
        m = d["methods"]
        print(f"{fam:<7}{d['sizes'][i]:>9}"
              f"{d['build'][i]:>9.2f}{m['gls']['time'][i]:>8.2f}"
              f"{m['idw']['time'][i]:>8.2f}{m['ls']['time'][i]:>8.2f}"
              f"{d.get('peak_rss_mb', 0):>9.0f}")
        print(f"{'(ref)':<7}{r['cells']:>9}{r['build']:>9.2f}"
              f"{r['gls']:>8.2f}{r['idw']:>8.2f}{r['ls']:>8.2f}"
              f"{r.get('rss_mb', 0):>9.0f}")


if __name__ == "__main__":
    main()
