"""Accuracy of GLS vs the dgels oracle as a function of df32 sweep count.

Question (CLAUDE.md bottleneck #1): does n_refine=1 (2 sweeps) keep the
mixed path at <=1e-10 vs the oracle at realistic mesh conditioning, or is
n_refine=2 (3 sweeps) load-bearing?  CholQR2's preconditioner residual is
~eps32*sqrt(m) independent of cond(A), so each sweep should contract the
error ~1e-6x — but the *structured-operator* products are df32, whose own
error floor scales with cond(A) through the residual evaluation.

Run on CPU (same df32 numerics class as the TPU kernel).
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/ninpol_tpu_jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from ninpol_tpu.interpolator import Interpolator  # noqa: E402
from ninpol_tpu.utils import meshgen  # noqa: E402
from tests.utils.cases import ALHCase  # noqa: E402
from tests.utils.oracle import gls_oracle  # noqa: E402


def run(fam, n):
    case = ALHCase()
    case.assign_mesh_properties(meshgen.FAMILIES[fam](n), seed=0)
    interp = Interpolator()
    interp.load_mesh(mesh_obj=case.mesh)
    v2i = interp.variable_to_index
    var = case.name
    perm = interp.cells_data[v2i["cells"]["permeability"]]
    dmag = interp.cells_data[v2i["cells"]["diff_mag"]]
    nflag = interp.points_data[v2i["points"][f"neumann_flag_{var}"]].astype(
        np.int64)
    nval = interp.points_data[v2i["points"][f"neumann_{var}"]]
    tp = np.arange(interp.grid.n_points)
    Wo, NWo, cond = gls_oracle(interp.grid, tp, perm, dmag, nflag, nval,
                               neumann_compat=True, return_cond=True)
    ok = cond < 1e7
    scale = max(np.abs(Wo[ok]).max(), 1.0)
    print(f"{fam} n={n}: {interp.grid.n_elems} cells, "
          f"{interp.grid.n_points} points, cond max(ok)={cond[ok].max():.2e}")
    for n_refine in (2, 1):
        interp.gls.n_refine = n_refine
        interp._prep_cache.clear()
        W, NW = interp.prepare_interpolator("gls", var, tp)
        err = np.abs(W[ok] - Wo[ok]).max() / scale
        errn = np.abs(NW[ok] - NWo[ok]).max() / scale
        # how many nodes would the rnorm fallback have re-solved?
        print(f"  n_refine={n_refine} (sweeps={n_refine + 1}): "
              f"W err={err:.3e}  NW err={errn:.3e}")


if __name__ == "__main__":
    for fam, n in (("tetra", 16), ("hexa", 20), ("prism", 12)):
        run(fam, n)
