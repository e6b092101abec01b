"""ninpol_tpu: TPU-native nodal interpolation for finite-volume schemes.

A ground-up JAX/XLA rebuild of the capabilities of ninpol (nodal
interpolation weights for MPFA-D finite-volume pressure solvers on
unstructured meshes): given a mesh and a cell-centered variable, compute
per-node weights over surrounding cells plus Neumann boundary corrections,
returned as a scipy CSR matrix (reference: README.md:20-34,
ninpol/__init__.py:1-3).
"""
import os as _os
import tempfile as _tempfile

import jax as _jax

# This is a float64 numerical library (the reference is float64
# throughout); JAX defaults to 32-bit unless x64 is enabled, which would
# silently truncate every array and destroy the 1e-10 parity contract.
_jax.config.update("jax_enable_x64", True)

# On TPU the default matmul precision is bfloat16; the solvers in ops/solve
# rely on true float32 MXU passes, so raise the default for this process.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: kernel shapes recur across runs (stencil
# buckets are rounded to coarse classes for exactly this reason).
_cache_dir = _os.environ.get(
    "NINPOL_TPU_JAX_CACHE",
    _os.path.join(_tempfile.gettempdir(), "ninpol_tpu_jax_cache"))
if _cache_dir != "0":
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    # 0: persist EVERY compiled program.  The 0.5s default left ~20
    # cheap consolidation programs out of the cache, so every fresh
    # process re-compiled them through the remote helper (measured:
    # 20 "fresh compiles" on a fully-warm second bench run).
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from .interpolator import Interpolator
from ._grid.grid import Grid
from ._io.mesh import Mesh, CellBlock, read as read_mesh, write as write_mesh

__version__ = "0.1.0"
__all__ = ["Interpolator", "Grid", "Mesh", "CellBlock", "read_mesh",
           "write_mesh"]
