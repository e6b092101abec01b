"""Compare the fused GLS kernel at B=32768 vs B=16384 on identical nodes.

The chunk_elems bump to 1.2e9 produced n_bad == (all full-chunk nodes)
at 1.9M tets: every node in a (E=24,F=36,B=32768) chunk reports
rnorm > tol while the same nodes at B<=16384 converge.  Both program
shapes are in the TPU compile cache, so this probe is cheap: run the
first 32768 interior nodes through one 32k chunk and through two 16k
chunks and diff w / wn / rnorm.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp
    from bench import build_problem
    from ninpol_tpu._methods.gls import _gls_bucket_kernel

    interp, bt = build_problem(68)
    grid = interp.grid
    print(f"# build {bt:.1f}s", flush=True)
    gls = interp.gls
    v2i = interp.variable_to_index
    # mirror prepare(): face cache via one tiny prepare on a small subset
    interior = np.nonzero(~grid.boundary_points.astype(bool))[0]
    interp.prepare_interpolator("gls", "u", interior[:256])
    face_pack, neumann_flag = gls._face_cache
    dg = interp.device_grid

    nodes = interior[:32768].astype(np.int32)

    def run(B):
        outs = []
        for lo in range(0, 32768, B):
            nd = np.zeros(B, np.int32)
            nd[:] = nodes[lo:lo + B]
            valid = np.ones(B, bool)
            w, wn, rn = _gls_bucket_kernel(
                jnp.asarray(nd), jnp.asarray(valid),
                dg.esup2d, dg.esup_cnt, dg.fsup2d, dg.fsup_cnt,
                dg.point_pack, dg.cell_pack, face_pack, neumann_flag,
                E=24, F=36, n_refine=gls.n_refine, exact=False,
                neumann_compat=True, with_neumann=False,
                solver="cholqr", fused=True, rounds=2)
            outs.append((np.asarray(w), np.asarray(wn), np.asarray(rn)))
        return tuple(np.concatenate([o[i] for o in outs]) for i in range(3))

    w16, wn16, rn16 = run(16384)
    w32, wn32, rn32 = run(32768)
    print(f"# rn16: max={rn16.max():.3e} n_bad={(rn16 > 1e-11).sum()}",
          flush=True)
    print(f"# rn32: max={rn32.max():.3e} n_bad={(rn32 > 1e-11).sum()}",
          flush=True)
    dw = np.abs(w32 - w16).max()
    dn = np.abs(wn32 - wn16).max()
    print(f"# |w32-w16|max={dw:.3e}  |wn32-wn16|max={dn:.3e}", flush=True)
    bad = np.nonzero(rn32 > 1e-11)[0]
    if len(bad):
        i = bad[0]
        print(f"# first bad node idx {i}: rn32={rn32[i]:.3e} "
              f"rn16={rn16[i]:.3e} tile={i // 128} "
              f"w32[:4]={w32[i][:4]} w16[:4]={w16[i][:4]}", flush=True)
        print(f"# bad idx distribution: first {bad[:8]} last {bad[-4:]} "
              f"count {len(bad)}", flush=True)


if __name__ == "__main__":
    main()
