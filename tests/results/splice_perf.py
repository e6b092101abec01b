"""Splice a single-level harness refresh into a per-family perf JSON.

Usage: python splice_perf.py perf_hexa.json refresh_hexa.json

The refresh file must hold exactly ONE level (the largest).  Its single
size must match the target's sizes[-1]; time/device_time/time_f32/error
for every method are replaced at the last index.  memory values are kept
from the original run (refresh runs use --rss none).

All validation happens BEFORE the target is mutated, so a malformed
refresh never leaves a partially-spliced file behind.
"""
import json
import sys


def main(target_path, refresh_path):
    with open(target_path) as f:
        target = json.load(f)
    with open(refresh_path) as f:
        refresh = json.load(f)
    fams = [k for k in refresh if isinstance(refresh[k], dict)
            and "sizes" in refresh[k]]
    # validate everything up front: no mutation until all checks pass
    for fam in fams:
        assert fam in target, f"{fam}: family missing from {target_path}"
        t, r = target[fam], refresh[fam]
        assert len(r["sizes"]) == 1, \
            f"{fam}: refresh must hold exactly one level, got {r['sizes']}"
        assert t["sizes"][-1] == r["sizes"][-1], \
            f"{fam}: size mismatch {t['sizes'][-1]} vs {r['sizes'][-1]}"
        for m in r["methods"]:
            assert m in t["methods"], \
                f"{fam}.{m}: method missing from {target_path}"
    for fam in fams:
        t, r = target[fam], refresh[fam]
        t["build"][-1] = r["build"][-1]
        for m, rec in r["methods"].items():
            for key in ("time", "device_time", "time_f32", "error"):
                t["methods"][m][key][-1] = rec[key][-1]
        print(f"{fam}: spliced last level ({t['sizes'][-1]} cells)")
    with open(target_path, "w") as f:
        json.dump(target, f, indent=2)
    print("wrote", target_path)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: python splice_perf.py <target.json> <refresh.json>")
    main(sys.argv[1], sys.argv[2])
