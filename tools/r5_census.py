"""Host-only census of the bench-scale GLS plan: which (E, F, B,
with_neumann) classes exist and how many nodes each covers.

No TPU work: builds the grid + plan exactly like bench.py, then walks
the buckets.  Run with a CPU-pinned jax:
  env PYTHONPATH= JAX_PLATFORMS=cpu python tools/r5_census.py [n]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    from bench import build_problem

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    interp, build_time = build_problem(n)
    grid = interp.grid
    dg = interp.device_grid
    print(f"mesh n={n}: {grid.n_elems} cells, {grid.n_points} points, "
          f"build {build_time:.2f}s")

    v2i = interp.variable_to_index
    nflag = interp.points_data[v2i["points"]["neumann_flag_u"]]
    tp = np.arange(grid.n_points)
    # the GLS prepare() bucket split (gls.py): Dirichlet-boundary nodes
    # excluded, neumann nodes separated
    dflag = interp.points_data[v2i["points"]["dirichlet_flag_u"]]
    active = ~(grid.boundary_points.astype(bool) & (dflag != 0))
    is_neu = nflag != 0

    gls = interp.gls
    total_nodes = 0
    classes = {}
    for mask, wneu in ((active & ~is_neu, False), (active & is_neu, True)):
        for b in dg.buckets(tp, mask, chunk_size=gls.chunk_nodes,
                            chunk_elems=gls.chunk_elems, batch_align=256):
            k = (b["E"], b["F"], len(b["pos"]), wneu)
            npos = int(b["valid"].sum())
            classes[k] = classes.get(k, 0) + npos
            total_nodes += npos
    print(f"{'E':>4} {'F':>4} {'B':>7} {'neu':>4} {'nodes':>9}  share")
    for (E, F, B, wneu), cnt in sorted(classes.items(),
                                       key=lambda kv: -kv[1]):
        print(f"{E:>4} {F:>4} {B:>7} {str(wneu):>4} {cnt:>9}  "
              f"{cnt/total_nodes:6.1%}")
    print(f"total bucketed nodes: {total_nodes}")


if __name__ == "__main__":
    main()
