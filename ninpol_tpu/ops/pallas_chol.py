"""Pallas TPU kernels for the f32 CholQR2 preconditioner build.

The GLS fast path (see methods/gls.py, solver="cholqr") needs, per node
bucket, three dense batched products and two Cholesky factorizations of
small (n x n) Gram matrices, n = 3E+1 ~ 40..80.  Measured on this chip:

  * XLA's batched einsum "bmn,bmk->bnk" runs at ~2 Tflop/s (it cannot
    keep the MXU busy on sub-128 matrices); a Pallas kernel issuing one
    explicit per-node `dot` keeps the systolic array fed and the A-tile
    read from HBM exactly once.
  * XLA's recursive matmul-only Cholesky (ops/solve.py
    chol_inverse_factor) costs ~56 ms per 8k-node chunk at n=128 — the
    deep recursion of tiny batched matmuls is launch-bound.  Here the
    factorization runs in the (n, n, NT) "VPU layout" (nodes on the
    128-lane axis) so every per-node scalar step is a full-width vector
    op, with the elimination step as a SEQUENTIAL GRID DIMENSION
    (this environment's Mosaic build cannot legalize lax loops inside
    kernels; constant-in-step output index maps carry the state).

Kernels:
  * gram_f32(A)            (B, m, n) -> (B, n, n) = A^T A       [MXU]
  * round2_gram_f32(A, Li) (B,m,n),(B,n,n) -> (B,n,n) =
                           (A Li^T)^T (A Li^T)                  [MXU]
  * chol_linv_f32(G)       (B, n, n) SPD -> Linv = L^{-1} with
                           G = L L^T (clamped pivots)           [VPU]

All kernels are float32-only: the CholQR2 preconditioner needs only f32
accuracy (the df32 refinement sweeps restore dgels-level precision; see
gls.py).  CPU fallbacks (same numerics class) live next to each kernel.

Reference being replaced: per-node LAPACK dgels (gls.pyx:420-474).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 128        # nodes per tile on the lane axis (chol kernel)
NB = 8          # nodes per grid step (matmul kernels)
INTERPRET = False
_VMEM_LIMIT = 100 * 1024 * 1024
_F32 = jnp.float32


# ---------------------------------------------------------------------------
# Batched per-node matmuls (MXU)
# ---------------------------------------------------------------------------
def _gram_kernel(a_ref, o_ref):
    for i in range(NB):
        a = a_ref[i]
        o_ref[i] = jax.lax.dot_general(
            a, a, (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)


def gram_f32(A):
    """(B, m, n) f32 -> (B, n, n) f32 Gram matrices A_b^T A_b."""
    B, m, n = A.shape
    if jax.default_backend() != "tpu":
        return jnp.einsum("bmn,bmk->bnk", A, A,
                          preferred_element_type=_F32)
    spec_in = pl.BlockSpec((NB, m, n), lambda i: (i, i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    spec_out = pl.BlockSpec((NB, n, n), lambda i: (i, i * 0, i * 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gram_kernel,
        grid=(B // NB,),
        in_specs=[spec_in],
        out_specs=spec_out,
        out_shape=jax.ShapeDtypeStruct((B, n, n), _F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(A)


def _round2_kernel(a_ref, li_ref, o_ref):
    for i in range(NB):
        a = a_ref[i]
        li = li_ref[i]
        # Q = A Li^T  (contract A's col dim with Li's col dim)
        q = jax.lax.dot_general(
            a, li, (((1,), (1,)), ((), ())),
            preferred_element_type=_F32)
        o_ref[i] = jax.lax.dot_general(
            q, q, (((0,), (0,)), ((), ())),
            preferred_element_type=_F32)


def round2_gram_f32(A, Li):
    """(B,m,n),(B,n,n) -> (B,n,n) = (A Li^T)^T (A Li^T).

    Fused so the intermediate Q never round-trips through HBM."""
    B, m, n = A.shape
    if jax.default_backend() != "tpu":
        Q = jnp.einsum("bmn,bkn->bmk", A, Li,
                       preferred_element_type=_F32)
        return jnp.einsum("bmn,bmk->bnk", Q, Q,
                          preferred_element_type=_F32)
    spec_a = pl.BlockSpec((NB, m, n), lambda i: (i, i * 0, i * 0),
                          memory_space=pltpu.VMEM)
    spec_li = pl.BlockSpec((NB, n, n), lambda i: (i, i * 0, i * 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _round2_kernel,
        grid=(B // NB,),
        in_specs=[spec_a, spec_li],
        out_specs=spec_li,
        out_shape=jax.ShapeDtypeStruct((B, n, n), _F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(A, Li)


# ---------------------------------------------------------------------------
# Single-pass CholQR2 preconditioner build, "VPU layout" end to end
# ---------------------------------------------------------------------------
def _gram_T(a, n):
    """A^T A for (m, n, NT)-layout a -> (n, n, NT), unrolled over j."""
    cols = []
    for j in range(n):
        cols.append(jnp.sum(a * a[:, j:j + 1, :], axis=0))   # (n, NT)
    return jnp.stack(cols, axis=1)                            # (n, n, NT)


def _chol_inplace(gscr, liscr, n, tiny, mul=None):
    """Unrolled Cholesky of gscr (n, n, NT) in place; liscr <- L^{-1}
    (or L^{-1} @ mul rows if mul given)."""
    for k in range(n):
        d2 = gscr[k, k, :][None]
        d2c = jnp.maximum(d2, _F32(tiny))
        dinv = jax.lax.rsqrt(d2c)
        if k + 1 < n:
            colb = gscr[k + 1:, k, :] * dinv
            gscr[k + 1:, k, :] = colb
            gscr[k + 1:, k + 1:, :] = (gscr[k + 1:, k + 1:, :]
                                       - colb[:, None, :] * colb[None, :, :])
        if mul is None:
            base = (jax.lax.broadcasted_iota(jnp.int32, (n, NT), 0)
                    == k).astype(_F32)
        else:
            base = mul[k, :, :]
        if k == 0:
            liscr[0, :, :] = base * dinv
        else:
            lrow = gscr[k, :k, :]
            s = jnp.sum(lrow[:, None, :] * liscr[:k, :, :], axis=0)
            liscr[k, :, :] = (base - s) * dinv


def _precond_kernel(a_ref, lc_ref, d_ref, dmax_ref, g_scr, li_scr,
                    *, m, n, tiny, shift):
    # equilibrate columns (dead = all-zero padding columns)
    a = a_ref[0]                                     # (m, n, NT)
    d2 = jnp.sum(a * a, axis=0)                      # (n, NT)
    dead = (d2 == 0).astype(_F32)
    dinv = jax.lax.rsqrt(jnp.where(d2 == 0, _F32(1), d2)) * (1 - dead)
    a = a * dinv[None, :, :]
    d_ref[0] = dinv[:, None, :]
    eyen = (jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            ).astype(_F32)[:, :, None]

    # round 1: G1 = As^T As (+shifted diag), Li1 = chol(G1)^-1
    g_scr[:] = _gram_T(a, n) + eyen * (dead + _F32(shift))[None, :, :]
    _chol_inplace(g_scr, li_scr, n, tiny)

    # round 2: Q = As Li1^T, G2 = Q^T Q
    li = li_scr[:]
    q_cols = []
    for i in range(n):
        q_cols.append(jnp.sum(a * li[i][None, :, :], axis=1))  # (m, NT)
    q = jnp.stack(q_cols, axis=1)                    # (m, n, NT)
    g_scr[:] = _gram_T(q, n) + eyen * dead[None, :, :]
    # Lc = L2^{-1} @ Li1 (fused): M r = Lc^T (Lc r).  diag(Lc) =
    # diag(Li2) * diag(Li1), so one max over it detects a clamped or
    # near-breakdown pivot in EITHER round.  li_scr is reused as the Lc
    # accumulator (its Li1 rows are consumed in order as `mul`).
    li1 = li_scr[:]
    dmax = jnp.zeros((NT,), _F32)
    # inline chol with mul = li1 rows, accumulating into lc list
    for k in range(n):
        d2 = g_scr[k, k, :][None]
        d2c = jnp.maximum(d2, _F32(tiny))
        dinv2 = jax.lax.rsqrt(d2c)
        if k + 1 < n:
            colb = g_scr[k + 1:, k, :] * dinv2
            g_scr[k + 1:, k, :] = colb
            g_scr[k + 1:, k + 1:, :] = (
                g_scr[k + 1:, k + 1:, :]
                - colb[:, None, :] * colb[None, :, :])
        base = li1[k]
        if k == 0:
            li_scr[0, :, :] = base * dinv2
        else:
            lrow = g_scr[k, :k, :]
            s = jnp.sum(lrow[:, None, :] * li_scr[:k, :, :], axis=0)
            li_scr[k, :, :] = (base - s) * dinv2
        dmax = jnp.maximum(dmax, jnp.abs(li_scr[k, k, :]))
    lc_ref[0] = li_scr[:]
    dmax_ref[0] = dmax[None]


def cholqr2_precond(A_t, tiny=1e-12, shift=1.5e-5):
    """One fused pass: column equilibration + shifted CholeskyQR2.

    A_t: (G, m, n, NT) float32, G = B/NT node tiles — the assembled
    per-node matrices with nodes on the 128-lane axis.  Every step
    (Gram, Cholesky, Q = A R1^{-1}, second Gram, combined factor
    Lc = L2^{-1} L1^{-1}) is a full-width VPU op and nothing leaves VMEM
    in between.  The TILED 4D layout matters: a (n, n, NT) block of an
    (n, n, B) array is ~5000 strided 512-byte DMA rows (~90 us of
    descriptor overhead PER GRID STEP — measured to dominate every
    small kernel); a (1, m, n, NT) block is one contiguous transfer.

    Returns (Lc (G,n,n,NT), Dinv (G,n,1,NT), dmax (G,1,NT));
    M r = D Lc^T Lc D r.  TPU only — the CPU path composes the same
    algorithm from LAPACK-backed pieces in methods/gls.py.
    """
    G, m, n, _ = A_t.shape
    kern = functools.partial(_precond_kernel, m=m, n=n, tiny=tiny,
                             shift=shift)
    sp = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (i * 0,) * len(dims),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[sp(m, n, NT)],
        out_specs=[sp(n, n, NT), sp(n, 1, NT), sp(1, NT)],
        out_shape=[jax.ShapeDtypeStruct((G, n, n, NT), _F32),
                   jax.ShapeDtypeStruct((G, n, 1, NT), _F32),
                   jax.ShapeDtypeStruct((G, 1, NT), _F32)],
        scratch_shapes=[pltpu.VMEM((n, n, NT), _F32),
                        pltpu.VMEM((n, n, NT), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(A_t)


def _prec_apply_T_kernel(lc_ref, v_ref, o_ref, *, n):
    v = v_ref[0]                                     # (n, 1, NT)
    lc = lc_ref[0]
    w1 = jnp.sum(lc * jnp.swapaxes(v, 0, 1), axis=1)
    w2 = jnp.sum(lc * w1[:, None, :], axis=0)
    o_ref[0] = w2[:, None, :]


def prec_apply_T(Lc_t, v_t):
    """M-apply in the tiled layout: Lc_t (G,n,n,NT), v_t (G,n,1,NT) f32
    -> (G,n,1,NT).  One contiguous DMA per tile (see cholqr2_precond)."""
    G, n, _, _ = Lc_t.shape
    sp = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (i * 0,) * len(dims),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_prec_apply_T_kernel, n=n),
        grid=(G,),
        in_specs=[sp(n, n, NT), sp(n, 1, NT)],
        out_specs=sp(n, 1, NT),
        out_shape=jax.ShapeDtypeStruct((G, n, 1, NT), _F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(Lc_t, v_t)


def _prec_apply_kernel(lc_ref, v_ref, o_ref, *, n):
    """o = Lc^T (Lc v) per node, (n, n, NT) layout."""
    v = v_ref[:]                                    # (n, 1, NT)
    lc = lc_ref[:]                                  # (n, n, NT)
    w1 = jnp.sum(lc * jnp.swapaxes(v, 0, 1), axis=1)   # (n, NT)
    w2 = jnp.sum(lc * w1[:, None, :], axis=0)          # (n, NT)
    o_ref[:] = w2[:, None, :]


def prec_apply_f32(Lc, v):
    """Apply the CholQR2 preconditioner M = Lc^T Lc per node.

    Lc: (B, n, n) f32 (combined factor Li2 @ Li1); v: (B, n) f32.
    Returns (B, n) f32.  One fused Pallas pass — XLA's batched matvecs
    re-read the factor once per matvec and lower poorly on sub-128
    shapes."""
    B, n, _ = Lc.shape
    if jax.default_backend() != "tpu":
        t = jnp.einsum("bnk,bk->bn", Lc, v)
        return jnp.einsum("bkn,bk->bn", Lc, t)
    lcT = jnp.transpose(Lc, (1, 2, 0))
    vT = jnp.transpose(v, (1, 0))[:, None, :]
    mspec = pl.BlockSpec((n, n, NT), lambda i: (i * 0, i * 0, i),
                         memory_space=pltpu.VMEM)
    vspec = pl.BlockSpec((n, 1, NT), lambda i: (i * 0, i * 0, i),
                         memory_space=pltpu.VMEM)
    oT = pl.pallas_call(
        functools.partial(_prec_apply_kernel, n=n),
        grid=(B // NT,),
        in_specs=[mspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((n, 1, B), _F32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(lcT, vT)
    return jnp.transpose(oT[:, 0, :], (1, 0))


# ---------------------------------------------------------------------------
# Batched Cholesky + inverse factor (VPU layout)
# ---------------------------------------------------------------------------
def _chol_kernel(g_ref, li_ref, scr, *, n, tiny, mul=None):
    """Statically UNROLLED Cholesky elimination (python loop over pivots
    at trace time — all slices static, no per-step grid overhead; this
    measured ~2x faster than running the pivot index as a grid
    dimension).  The factor lives in VMEM scratch; only L^{-1} is
    written out.  With ``mul`` set (a second VMEM ref holding another
    lower-triangular P), the output becomes L^{-1} @ P computed row by
    row at no extra memory cost."""
    scr[:] = g_ref[:]
    li_ref[:] = jnp.zeros((n, n, NT), _F32)
    for k in range(n):
        d2 = scr[k, k, :][None]                    # (1, NT)
        d2c = jnp.maximum(d2, _F32(tiny))
        dinv = jax.lax.rsqrt(d2c)
        if k + 1 < n:
            colb = scr[k + 1:, k, :] * dinv        # (n-k-1, NT)
            scr[k + 1:, k, :] = colb
            scr[k + 1:, k + 1:, :] = (scr[k + 1:, k + 1:, :]
                                      - colb[:, None, :] * colb[None, :, :])
        # row k of Linv (or of Linv @ P): (e_k^T or P[k,:]) minus the
        # combination of previous rows, scaled by 1/d
        if mul is None:
            base = (jax.lax.broadcasted_iota(jnp.int32, (n, NT), 0)
                    == k).astype(_F32)
        else:
            base = mul[k, :, :]
        if k == 0:
            li_ref[0, :, :] = base * dinv
        else:
            lrow = scr[k, :k, :]                   # (k, NT)
            s = jnp.sum(lrow[:, None, :] * li_ref[:k, :, :], axis=0)
            li_ref[k, :, :] = (base - s) * dinv


def chol_linv_f32(G, tiny=1e-12, mul_right=None):
    """Batched SPD Cholesky inverse factor.

    G: (B, n, n) f32 SPD (B a multiple of 128).  Returns Linv (B, n, n)
    with G = L L^T, Linv = L^{-1} (lower triangular); with ``mul_right``
    (B, n, n) given, returns L^{-1} @ mul_right instead (fused — used to
    form the combined CholQR2 factor Li2 @ Li1 in one pass).  Pivots
    below ``tiny`` are clamped — callers detect breakdown via
    ``max |diag(Linv)|`` (>= 1/sqrt(tiny) means a clamped pivot).
    """
    B, n, _ = G.shape
    if jax.default_backend() != "tpu":
        # CPU: LAPACK-backed, same f32 numerics class
        L = jnp.linalg.cholesky(
            G + (tiny * jnp.eye(n, dtype=G.dtype))[None])
        L = jnp.where(jnp.isfinite(L), L, 0.0)
        rhs = (jnp.broadcast_to(jnp.eye(n, dtype=G.dtype), G.shape)
               if mul_right is None else mul_right)
        Li = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        return jnp.where(jnp.isfinite(Li), Li, _F32(1e6))
    GT = jnp.transpose(G, (1, 2, 0))
    spec = pl.BlockSpec((n, n, NT), lambda i: (i * 0, i * 0, i),
                        memory_space=pltpu.VMEM)
    if mul_right is None:
        kern = functools.partial(_chol_kernel, n=n, tiny=tiny)
        in_specs = [spec]
        ins = (GT,)
    else:
        def kern(g_ref, p_ref, li_ref, scr):
            _chol_kernel(g_ref, li_ref, scr, n=n, tiny=tiny, mul=p_ref)
        in_specs = [spec, spec]
        ins = (GT, jnp.transpose(mul_right, (1, 2, 0)))
    liT = pl.pallas_call(
        kern,
        grid=(B // NT,),
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, n, B), _F32),
        scratch_shapes=[pltpu.VMEM((n, n, NT), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(*ins)
    return jnp.transpose(liT, (2, 0, 1))
