"""Multi-chip sharding over a virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ninpol_tpu.interpolator import Interpolator
from ninpol_tpu.parallel.sharding import make_mesh, sharded_gls
from ninpol_tpu.utils import meshgen
from tests.utils.cases import ALHCase

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


def _setup():
    case = ALHCase()
    case.assign_mesh_properties(meshgen.tetra_mesh(3), seed=0)
    interp = Interpolator()
    interp.load_mesh(mesh_obj=case.mesh)
    v2i = interp.variable_to_index
    perm = jnp.asarray(
        interp.cells_data[v2i["cells"]["permeability"]].reshape(-1, 3, 3))
    dmag = jnp.asarray(interp.cells_data[v2i["cells"]["diff_mag"]])
    nflag = jnp.asarray(interp.points_data[
        v2i["points"]["neumann_flag_ALH"]].astype(np.int32))
    nval = jnp.asarray(interp.points_data[v2i["points"]["neumann_ALH"]])
    return interp, perm, dmag, nflag, nval


@needs_8
@pytest.mark.parametrize("shard_geometry", [False, True])
def test_sharded_matches_single_device(shard_geometry):
    interp, perm, dmag, nflag, nval = _setup()
    grid = interp.grid
    dg = interp.device_grid
    tp = np.arange(grid.n_points)
    nflag_h = np.asarray(nflag)
    active = ~(grid.boundary_points[tp].astype(bool) & (nflag_h[tp] == 0))

    # single-device result through the normal driver
    W_ref, _ = interp.prepare_interpolator("gls", "ALH", tp)

    mesh = make_mesh(8)
    run = sharded_gls(dg, mesh, shard_geometry=shard_geometry)
    # interior bucket only (with_neumann=False path is the sharded target)
    is_neu = nflag_h[tp] != 0
    buckets = dg.buckets(tp, active & ~is_neu)
    assert buckets
    b = buckets[0]
    w, wn, err = run(b, perm, dmag, nflag, nval)
    w = np.asarray(w)
    sel = b["valid"]
    pos = b["pos"][sel]
    assert np.abs(w[sel][:, :W_ref.shape[1]] - W_ref[pos]).max() < 1e-11
