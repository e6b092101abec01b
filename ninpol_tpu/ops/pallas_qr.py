"""Pallas TPU kernels: batched df32 Householder QR + triangular solves.

The GLS solve needs per-node least squares at ~1e-12 accuracy.  On TPU:
  * float64 is emulated and an order of magnitude too slow, and any
    float32 preconditioner caps the refinement rate at cond(G)*eps32
    (~0.1 at 1M-cell meshes — 10+ sweeps to converge),
  * XLA does not fuse long double-float32 op chains (a pure-jnp df32 QR
    measured 24 s per 8192-node chunk, memory-bound on materialized
    intermediates).

These kernels keep each node-tile's matrix pair RESIDENT IN VMEM with
nodes on the 128-lane axis, so every per-node scalar op is a full-width
VPU op.  The Householder/substitution step index is a SEQUENTIAL GRID
DIMENSION whose output block mapping is constant in that dimension — the
canonical Pallas accumulation pattern (this environment's Mosaic build
cannot legalize lax loops inside kernels, so in-kernel loops are out).

  * qr_r_df32(Ah, Al)            (B, m, n) f32 pair -> triangularized
    (m, n, B) pair; R = result[:n].  df32 arithmetic (error-free
    transforms from ops/df32.py — pure f32 adds/muls, ~2^-44).
  * sne_solve_df32(Rh, Rl, b)    solves (R^T R) y = b (semi-normal
    equations) by forward+backward substitution in df32.

Combined with one float64 structured-residual correction (corrected
semi-normal equations, Björck), GLS weights land at ~eps64*cond(A) —
LAPACK-dgels level — at float32 speed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import df32

NT = 128   # nodes per tile (lane axis)
INTERPRET = False  # interpreter mode (tests on CPU)
MB = 32    # row-block size for VMEM-bounded updates
_VMEM_LIMIT = 100 * 1024 * 1024


def _qr_step_kernel(ah_ref, al_ref, rh_ref, rl_ref, *, m, n):
    """One Householder step (column k = grid dim 1) on the VMEM-resident
    (m, n, NT) pair; the out block mapping is constant in k so state
    persists across steps."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        rh_ref[:] = ah_ref[:]
        rl_ref[:] = al_ref[:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (m, 1, 1), 0)
    colh = rh_ref[:, pl.ds(k, 1), :]
    coll = rl_ref[:, pl.ds(k, 1), :]
    mask = (rows >= k).astype(jnp.float32)
    x = (colh * mask, coll * mask)                   # (m,1,NT)

    s2 = df32.tree_sum(df32.mul(x, x), axis=0)       # (1,NT)
    normx = df32.sqrt(s2)
    e_k = (rows == k).astype(jnp.float32)
    xk = jnp.sum(x[0] * e_k, axis=0)
    one = jnp.ones_like(xk)
    sgn = jnp.where(xk >= 0, -one, one)
    v = df32.add(x, (-sgn * normx[0] * e_k, -sgn * normx[1] * e_k))

    vn = df32.tree_sum(df32.mul(v, v), axis=0)
    two = (jnp.full_like(vn[0], 2.0), jnp.zeros_like(vn[0]))
    safe_vn = (jnp.where(vn[0] > 0, vn[0], 1.0), vn[1])
    beta = df32.div(two, safe_vn)
    beta = (jnp.where(vn[0] > 0, beta[0], 0.0),
            jnp.where(vn[0] > 0, beta[1], 0.0))
    bv = df32.mul(beta, v)                           # (m,1,NT)

    # w = v^T R accumulated over row blocks (bounds VMEM temporaries).
    # v vanishes below row k, so blocks entirely above k contribute
    # nothing and blocks below k never change — ~2x work saved.
    wh = jnp.zeros((n, NT), jnp.float32)
    wl = jnp.zeros((n, NT), jnp.float32)
    for mb in range(m // MB):
        pw_zero = (jnp.zeros((n, NT), jnp.float32),
                   jnp.zeros((n, NT), jnp.float32))
        blk = (rh_ref[mb * MB:(mb + 1) * MB, :, :],
               rl_ref[mb * MB:(mb + 1) * MB, :, :])
        vb = (v[0][mb * MB:(mb + 1) * MB], v[1][mb * MB:(mb + 1) * MB])
        pw = df32.tree_sum(df32.mul(vb, blk), axis=0)
        wh, wl = df32.add((wh, wl), pw)

    # R -= (beta v) w^T, row block at a time (skip finished blocks)
    def _update_block(mb):
        blk = (rh_ref[mb * MB:(mb + 1) * MB, :, :],
               rl_ref[mb * MB:(mb + 1) * MB, :, :])
        bvb = (bv[0][mb * MB:(mb + 1) * MB],
               bv[1][mb * MB:(mb + 1) * MB])
        u = df32.mul(bvb, (wh[None, :, :], wl[None, :, :]))
        nh, nl = df32.add(blk, (-u[0], -u[1]))
        rh_ref[mb * MB:(mb + 1) * MB, :, :] = nh
        rl_ref[mb * MB:(mb + 1) * MB, :, :] = nl

    for mb in range(m // MB):
        if INTERPRET:
            _update_block(mb)
        else:
            pl.when(k < (mb + 1) * MB)(lambda mb=mb: _update_block(mb))


def qr_r_df32(Ah, Al):
    """(B, m, n) f32 pair -> (m, n, B) pair triangularized in place
    (upper-triangular in the leading n rows).  B must be a multiple of
    NT; m a multiple of MB (pad with zero rows — harmless in LS)."""
    B, m, n = Ah.shape
    AhT = jnp.transpose(Ah, (1, 2, 0))
    AlT = jnp.transpose(Al, (1, 2, 0))
    kern = functools.partial(_qr_step_kernel, m=m, n=n)
    # index-map constants must be derived from grid vars (i*0): this
    # environment's Mosaic cannot legalize mixed-width literal components
    spec = pl.BlockSpec((m, n, NT), lambda i, k: (k * 0, k * 0, i),
                        memory_space=pltpu.VMEM)
    rh, rl = pl.pallas_call(
        kern,
        grid=(B // NT, n),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((m, n, B), jnp.float32),
            jax.ShapeDtypeStruct((m, n, B), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(AhT, AlT)
    return rh, rl


def _solve_step_kernel(rh_ref, rl_ref, bh_ref, bl_ref, zh_ref, zl_ref,
                       yh_ref, yl_ref, *, n, tiny):
    """Grid dim 1 runs 2n sequential steps: forward substitution
    (R^T z = b) for k in [0, n), then backward (R y = z)."""
    kk = pl.program_id(1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, 1, 1), 0)

    @pl.when(kk == 0)
    def _():
        zh_ref[:] = jnp.zeros((n, 1, NT), jnp.float32)
        zl_ref[:] = jnp.zeros((n, 1, NT), jnp.float32)
        yh_ref[:] = jnp.zeros((n, 1, NT), jnp.float32)
        yl_ref[:] = jnp.zeros((n, 1, NT), jnp.float32)

    def diag_at(k):
        dh = rh_ref[pl.ds(k, 1), pl.ds(k, 1), :][0]   # (1,NT)
        dl = rl_ref[pl.ds(k, 1), pl.ds(k, 1), :][0]
        bad = jnp.abs(dh) < tiny
        return jnp.where(bad, 1.0, dh), jnp.where(bad, 0.0, dl)

    @pl.when(kk < n)
    def _fwd():
        k = kk
        colh = rh_ref[:, pl.ds(k, 1), :]
        coll = rl_ref[:, pl.ds(k, 1), :]
        mask = (rows < k).astype(jnp.float32)
        s = df32.tree_sum(
            df32.mul((colh * mask, coll * mask), (zh_ref[:], zl_ref[:])),
            axis=0)                                   # (1,NT)
        bk = (bh_ref[pl.ds(k, 1), 0, :], bl_ref[pl.ds(k, 1), 0, :])
        num = df32.add(bk, (-s[0], -s[1]))
        dh, dl = diag_at(k)
        zk = df32.div(num, (dh, dl))
        zh_ref[pl.ds(k, 1), :, :] = zk[0][:, None, :]
        zl_ref[pl.ds(k, 1), :, :] = zk[1][:, None, :]

    @pl.when(kk >= n)
    def _bwd():
        k = 2 * n - 1 - kk
        rowh = jnp.swapaxes(rh_ref[pl.ds(k, 1), :, :], 0, 1)  # (n,1,NT)
        rowl = jnp.swapaxes(rl_ref[pl.ds(k, 1), :, :], 0, 1)
        mask = (rows > k).astype(jnp.float32)
        s = df32.tree_sum(
            df32.mul((rowh * mask, rowl * mask), (yh_ref[:], yl_ref[:])),
            axis=0)
        zk = (zh_ref[pl.ds(k, 1), 0, :], zl_ref[pl.ds(k, 1), 0, :])
        num = df32.add(zk, (-s[0], -s[1]))
        dh, dl = diag_at(k)
        yk = df32.div(num, (dh, dl))
        yh_ref[pl.ds(k, 1), :, :] = yk[0][:, None, :]
        yl_ref[pl.ds(k, 1), :, :] = yk[1][:, None, :]


def sne_solve_df32(Rh, Rl, bh, bl, tiny=1e-7):
    """Solve (R^T R) y = b per node in df32.

    Rh/Rl: (m, n, B) triangularized pair from qr_r_df32 (leading n rows
    read).  b: (B, n) f32 pair.  Returns (B, n) f32 pair.
    """
    m, n, B = Rh.shape
    bhT = jnp.transpose(bh, (1, 0))[:, None, :]
    blT = jnp.transpose(bl, (1, 0))[:, None, :]
    kern = functools.partial(_solve_step_kernel, n=n, tiny=tiny)
    rspec = pl.BlockSpec((n, n, NT), lambda i, k: (k * 0, k * 0, i),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((n, 1, NT), lambda i, k: (k * 0, k * 0, i),
                         memory_space=pltpu.VMEM)
    zh, zl, yh, yl = pl.pallas_call(
        kern,
        grid=(B // NT, 2 * n),
        in_specs=[rspec, rspec, vspec, vspec],
        out_specs=[vspec, vspec, vspec, vspec],
        out_shape=[jax.ShapeDtypeStruct((n, 1, B), jnp.float32)] * 4,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(Rh[:n], Rl[:n], bhT, blT)
    return (jnp.transpose(yh[:, 0, :], (1, 0)),
            jnp.transpose(yl[:, 0, :], (1, 0)))


def r_diag_quality(Rh):
    """min|diag| / max|diag| of R — singularity indicator for the exact
    fallback.  Rh: (m, n, B)."""
    n = Rh.shape[1]
    idx = jnp.arange(n)
    d = jnp.abs(Rh[idx, idx, :])                     # (n, B)
    return jnp.min(d, axis=0) / jnp.maximum(jnp.max(d, axis=0), 1e-30)
