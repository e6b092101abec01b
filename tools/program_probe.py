"""Enumerate the distinct compiled programs a bench run pulls through
the remote helper at a given mesh scale (host-side only: builds the
grid + bucket plan, never touches the TPU).

Every distinct program costs ~10 s of executable load through this
environment's remote helper even fully cached (CLAUDE.md), so warm
start is linear in THIS count.  Usage:

    env PYTHONPATH= JAX_PLATFORMS=cpu python tools/program_probe.py [n]
"""
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main(n=68):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import bench
    interp, build_time = bench.build_problem(n)
    grid = interp.grid
    print(f"mesh: {grid.n_elems} cells, {grid.n_points} points, "
          f"build {build_time:.2f}s")
    dg = interp.device_grid
    v2i = interp.variable_to_index
    nflag = interp.points_data[
        v2i["points"]["neumann_flag_u"]].astype(np.int32)
    tp = np.arange(grid.n_points)
    active = ~(grid.boundary_points[tp].astype(bool) & (nflag[tp] == 0))
    is_neu = nflag[tp] != 0

    from ninpol_tpu._methods.gls import _build_scan_units \
        as build_scan_units
    gls = interp.gls
    all_buckets = []
    for mask, wneu in ((active & ~is_neu, False), (active & is_neu, True)):
        for b in dg.buckets(tp, mask, chunk_size=gls.chunk_nodes,
                            chunk_elems=gls.chunk_elems):
            b["with_neumann"] = wneu
            all_buckets.append(b)
    units = build_scan_units(all_buckets)

    sig_counts = Counter()
    per_sig_nodes = Counter()
    for kind, p in units:
        S = p.get("S", 1)
        sig = (kind, p["E"], p["F"], S, len(p["pos"]) // S,
               p["with_neumann"])
        sig_counts[sig] += 1
        per_sig_nodes[sig] += int(np.asarray(p["valid"]).sum())

    print(f"\nchunks: {len(all_buckets)}, units: {len(units)}, "
          f"distinct unit sigs: {len(sig_counts)}")
    total_pad = 0
    for sig, cnt in sorted(sig_counts.items()):
        kind, E, F, S, B, wneu = sig
        padded = cnt * S * B
        real = per_sig_nodes[sig]
        total_pad += padded - real
        print(f"  {kind:6s} E={E:3d} F={F:3d} S={S:2d} B={B:6d} "
              f"neu={int(wneu)}  x{cnt}  real={real:7d} "
              f"padded={padded:7d} (+{padded - real})")
    print(f"total padding nodes: {total_pad}")

    # solve + gather programs (pregather doubles each sig), plus
    # consolidation/delivery programs
    n_sigs = len(sig_counts)
    payload_shapes = tuple(len(p["pos"]) for _, p in units)
    from ninpol_tpu._methods.device_grid import group_plan
    n_groups = len(group_plan(list(units)))
    progs = {
        "gather (pregather)": n_sigs,
        "solve": n_sigs,
        "consolidate_rnorm (host path)": 1,
        "concat groups (host path)": n_groups,
        "consolidate_device (device_out path)": 1,
        "preload-dummy variants": 0,
    }
    print("\nprogram classes per full bench (host + device phases):")
    tot = 0
    for k, v in progs.items():
        print(f"  {k}: {v}")
        tot += v
    print(f"  TOTAL (excl. exact-fallback + CSR reuse): {tot}")
    print(f"plan shape sequence: {payload_shapes}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 68)
