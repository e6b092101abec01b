"""Mosaic (TPU) lowering regression tests — run on CPU, no hardware.

The fused GLS kernel is lowered for the TPU backend via jax's AOT
cross-platform path (``.trace(...).lower(lowering_platforms=("tpu",))``),
which runs the full Pallas->Mosaic pipeline locally.  This catches an
entire bug class that the CPU test suite cannot see and that costs a
multi-minute remote compile per attempt to discover on hardware: weak
python-int / python-float literals inside the kernel trace as i64/f64
constants under x64, and Mosaic's convert helper recurses forever on
them (RecursionError at lowering time).  Two real instances:

  * pallas_chol int literals (fixed by pinning to jnp.int32, 68547bf)
  * df32.tree_sum's default jnp.pad constant 0 (weak i64) — only hit
    for stencil sizes where a reduction axis is not a power of two,
    i.e. bucket shapes the tetra bench never compiled.

The shapes below sweep the canonical stencil-size ladder
(device_grid._SIZE_LADDER) combos seen on real meshes, including
E=20/F=28 which reproduced the tree_sum crash.
"""
import jax
import jax.numpy as jnp
import pytest
from functools import partial

from ninpol_tpu._methods import gls

# (E, F, with_neumann) — ladder combos; E=20/F=28 is the tree_sum
# regression shape, E=24/F=36 the flagship tetra interior bucket.
SHAPES = [
    (8, 12, False),
    (20, 28, True),
    (24, 36, True),
]


def _lower(E, F, with_neumann, B=256):
    n_pts = n_cells = n_faces = 64
    args = dict(
        nodes=jnp.zeros((B,), jnp.int32),
        valid=jnp.ones((B,), bool),
        esup2d=jnp.zeros((n_pts, E), jnp.int32),
        esup_cnt=jnp.ones((n_pts,), jnp.int32),
        fsup2d=jnp.zeros((n_pts, F), jnp.int32),
        fsup_cnt=jnp.ones((n_pts,), jnp.int32),
        point_pack=jnp.zeros((n_pts, 6), jnp.float32),
        cell_pack=jnp.zeros((n_cells, 6), jnp.float32),
        face_pack=jnp.zeros((n_faces, 30), jnp.float32),
        neumann_flag=jnp.zeros((n_pts,), jnp.int32),
    )
    f = partial(gls._gls_bucket_impl, E=E, F=F, fused=True,
                with_neumann=with_neumann)
    return jax.jit(f).trace(**args).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize("E,F,wn", SHAPES)
def test_fused_bucket_lowers_for_tpu(E, F, wn):
    lowered = _lower(E, F, wn)
    # the Mosaic kernel must actually be present in the module
    assert "tpu_custom_call" in lowered.as_text()
