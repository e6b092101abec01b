"""Pallas TPU kernels for the GLS mixed-precision solve.

The production TPU path is ONE kernel, :func:`gls_solve_fused`: per
128-node tile it assembles the per-node least-squares matrices from the
geometric pieces, builds a shifted CholeskyQR2 preconditioner, runs the
double-float32 structured-residual refinement sweeps, and emits the node
weights — entirely in VMEM, in the "VPU layout" (nodes on the 128-lane
axis, so every per-node scalar step is a full-width vector op).

Hard-won facts this design encodes (measured on this chip):
  * per-node MXU matmuls (batched einsum OR per-node Pallas `dot`) are
    DMA/latency-bound at ~1.2 us/node on these sub-128 matrices — the
    lane-parallel VPU layout wins despite costing more raw FLOPs;
  * blocks must be TILED (G, ..., NT): an (n, n, NT) block of an
    (n, n, B) array is ~5000 strided 512-byte DMA rows (~90 us of
    descriptor overhead per grid step);
  * statically unrolled python loops over pivots/columns beat
    grid-dimension sequential steps ~2x (and Mosaic here cannot
    legalize lax loops in kernels anyway);
  * sublane-offset slices cost relayout work — the working width is
    padded to a sublane multiple (n_pad) and every heavy sequential pass
    runs on 8-aligned slabs: 8-wide Cholesky panels (_chol_panels),
    8-row blocked inverse rows (_linv_rows), each sharing one read of
    its large operand across the 8 lanes of work;
  * the three heavy MATMUL stages (Gram1, Q = A Li1^T, Gram2) are the
    exception to the VPU rule: as batched per-node dot_generals on a
    VMEM-transposed (NT, m, n) copy they run at 686 ns/node combined vs
    ~1730 ns/node for the VPU slab forms (tools/mxu_probe.py) — the old
    "1.2 us/node DMA-bound" lore was for HBM-resident per-node tiles
    and does NOT apply inside the fused kernel.

Float32 suffices for the preconditioner because CholQR2's residual is
~eps32*sqrt(m) independent of cond(A); the df32 sweeps restore
dgels-level accuracy (see methods/gls.py).  The batched helpers below
(gram_f32, round2_gram_f32, chol_linv_f32, prec_apply_f32) compose the
same algorithm from LAPACK-backed pieces on CPU.

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
# Fully fused GLS solve: assembly + shifted CholQR2 + df32 refinement
# sweeps + weight extraction, one VMEM-resident pass per node tile
# ---------------------------------------------------------------------------
def _iota_eq(shape, axis, k):
    return (jax.lax.broadcasted_iota(jnp.int32, shape, axis)
            == k).astype(_F32)


# Super-panel width for the OPTIONAL two-level MXU variant of the
# blocked Cholesky / inverse-row passes (lt_scr/limx_scr given): prior
# super-panels fold in through batched per-node MXU dot_generals.
# NEGATIVE RESULT (round 4, tools/chol_mxu_probe.py on v5e, E=24,
# n_pad=80): every width LOSES to the all-VPU baseline — 636 ns/node
# VPU vs 1850 (sup=8) / 1318 (16) / 1026 (32) / 781 (48) — because each
# batched sub-128 dot_general costs ~100+ ns/node of Mosaic dispatch
# latency + cross-layout relayout, and the VPU form is already near
# flop-bound.  The production kernel therefore calls these helpers
# WITHOUT the scratches; the MXU paths remain for the probe's A/B.
CHOL_SUP = 32
_HI = jax.lax.Precision.HIGHEST


def _chol_panels(gscr, n_pad, tiny, lt_scr=None, sup=CHOL_SUP, tri=False):
    """Blocked Cholesky of G stored by COLUMN planes: gscr[c, r, :] =
    G[r, c] on entry, L[r, c] on exit (entries above the diagonal are
    garbage).

    ``tri=True`` (production, exclusive with lt_scr) restricts every
    pass to the lower triangle at 8-row granularity — the panel columns
    start at their own diagonal block and the trailing update walks
    8-column panels each updating only rows >= its diagonal — cutting
    the VPU flops ~2x while keeping every slice sublane-aligned
    (A/B: tools/chol_tri_probe.py).  Bitwise identical to tri=False on
    the lower triangle: the skipped work only ever touched
    above-diagonal garbage.

    With ``lt_scr`` (a (NT, n_pad, n_pad) VMEM ref), the factorization
    is LEFT-LOOKING at ``sup``-wide super-panels: all prior super-panels
    fold into the current one through ONE batched per-node MXU
    dot_general against lt_scr — the incrementally maintained MXU-layout
    transpose of the factor (lt_scr[q, j, r] = L[r, j], lower-triangular
    masked incl. diagonal, written one 8-panel at a time) — and the
    right-looking VPU
    rank-8 trailing updates are confined to the super-panel's columns.
    This moves the kernel's largest stage (the full-width trailing
    updates, matmul-shaped) onto the MXU.  Without lt_scr the original
    all-VPU right-looking form runs (CPU-test / probe baseline).

    Returns the per-pivot inverse diagonals dinv[k] (each (NT,)) — this
    IS diag(L^{-1}), used for breakdown detection (a clamped pivot shows
    up as dinv ~ 1/sqrt(tiny)) and by the row solver."""
    dinvs = []
    if tri:
        assert lt_scr is None
        for k0 in range(0, n_pad, 8):
            # panel columns carry only their rows >= k0 (local row r-k0)
            pan = gscr[k0:k0 + 8, k0:, :]              # (8, n_pad-k0, NT)
            cols = []
            for c in range(8):
                colc = pan[c]                          # (n_pad-k0, NT)
                for p in range(c):
                    lkp = cols[p][c, :]                # L[k0+c, k0+p]
                    colc = colc - cols[p] * lkp[None, :]
                piv = colc[c, :]
                dinv = jax.lax.rsqrt(jnp.maximum(piv, _F32(tiny)))
                colc = colc * dinv[None, :]
                dinvs.append(dinv)
                cols.append(colc)
                gscr[k0 + c, k0:, :] = colc
            # trailing update, one 8-column panel at a time, each only
            # from its own diagonal block down
            for j0 in range(k0 + 8, n_pad, 8):
                tr = gscr[j0:j0 + 8, j0:, :]           # (8, n_pad-j0, NT)
                for c in range(8):
                    tc = cols[c][j0 - k0:j0 - k0 + 8, :]
                    trr = cols[c][j0 - k0:, :]
                    tr = tr - tc[:, None, :] * trr[None, :, :]
                gscr[j0:j0 + 8, j0:, :] = tr
        return dinvs
    for k0 in range(0, n_pad, 8):
        ks = (k0 // sup) * sup if lt_scr is not None else 0
        if lt_scr is not None and k0 == ks and k0 > 0:
            # MXU fold of ALL prior super-panels into this one:
            # st[c, r] = sum_{j<k0} L[r, j] * L[k0+c, j].  The column
            # operand reads the factor rows from gscr (sublane-aligned
            # planes); the row operand is lt_scr, whose masked planes
            # keep garbage (above-diagonal) entries out of the dot.
            w = min(sup, n_pad - k0)
            lrB = gscr[:k0, k0:k0 + w, :]              # (k0, w, NT)
            ltp = jnp.transpose(lrB, (2, 0, 1))        # (NT, k0, w)
            s = jax.lax.dot_general(
                lt_scr[:, :k0, :], ltp,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=_F32, precision=_HI)
            st = jnp.transpose(s, (2, 1, 0))           # (w, n_pad, NT)
            gscr[k0:k0 + w, :, :] = gscr[k0:k0 + w, :, :] - st
        pan = gscr[k0:k0 + 8, :, :]                    # (8, n_pad, NT)
        cols = []
        for c in range(8):
            colc = pan[c]                              # (n_pad, NT)
            for p in range(c):
                lkp = cols[p][k0 + c, :]               # L[k0+c, k0+p]
                colc = colc - cols[p] * lkp[None, :]
            piv = colc[k0 + c, :]
            dinv = jax.lax.rsqrt(jnp.maximum(piv, _F32(tiny)))
            colc = colc * dinv[None, :]
            dinvs.append(dinv)
            cols.append(colc)
            gscr[k0 + c, :, :] = colc
        if lt_scr is not None:
            # append this panel to the MXU-layout factor transpose,
            # strictly-lower masked (keeps garbage out of later folds)
            masked = [
                cols[c] * (jax.lax.broadcasted_iota(
                    jnp.int32, (n_pad, NT), 0)
                    >= jnp.int32(k0 + c)).astype(_F32)
                for c in range(8)]
            pstk = jnp.stack(masked, axis=0)           # (8, n_pad, NT)
            lt_scr[:, k0:k0 + 8, :] = jnp.transpose(pstk, (2, 0, 1))
        send = (ks + min(sup, n_pad - ks)) if lt_scr is not None else n_pad
        if k0 + 8 < send:
            # right-looking rank-8 trailing update, confined to this
            # super-panel's columns (full column height)
            tr = gscr[k0 + 8:send, k0 + 8:, :]
            for c in range(8):
                tc = cols[c][k0 + 8:send, :]
                trr = cols[c][k0 + 8:, :]
                tr = tr - tc[:, None, :] * trr[None, :, :]
            gscr[k0 + 8:send, k0 + 8:, :] = tr
    return dinvs


def _linv_rows(gscr, li_scr, n_pad, dinvs, mul=None, limx_scr=None,
               sup=CHOL_SUP, tri=False):
    """li_scr[k] (ROW plane k) <- row k of L^{-1} (or of L^{-1} @ mul,
    with ``mul`` a value holding row planes).  Each 8-row block folds in
    prior blocks, then resolves the in-block couplings sequentially.  L
    is read from gscr column planes (as left by _chol_panels).

    With ``limx_scr`` (a (NT, n_pad, n_pad) VMEM ref), prior SUPER-panels
    (width ``sup``) fold through one batched per-node MXU dot_general
    against limx_scr — the incrementally maintained MXU-layout copy of
    the inverse rows (limx_scr[q, k, :] = row k) — and only the in-super
    prior 8-blocks stream through the VPU.  On exit limx_scr holds the
    full L^{-1} in MXU layout (= transpose(li, (2, 0, 1))), which the
    fused kernel reuses directly as the Q = A Li^T operand.  Without
    limx_scr the original all-VPU streamed fold runs.

    Rows are exactly zero right of the diagonal by construction (the
    one-hot base and the triangular ``mul`` rows guarantee it).

    ``tri=True`` (production, exclusive with limx_scr) computes each
    8-row block only on its live columns 0..k0+8 — the zero right-of-
    diagonal tail is stored by one upfront zero fill instead of being
    multiplied through every fold (A/B: tools/chol_tri_probe.py).
    Bitwise identical output to tri=False."""
    if tri:
        assert limx_scr is None
        li_scr[:, :, :] = jnp.zeros((n_pad, n_pad, NT), _F32)
        for k0 in range(0, n_pad, 8):
            w = k0 + 8                                 # live columns
            acc = jnp.zeros((8, w, NT), _F32)
            if k0 > 0:
                lrB = gscr[0:k0, k0:k0 + 8, :]         # (k0, 8, NT)
                for j in range(k0):
                    acc = (acc + lrB[j][:, None, :]
                           * li_scr[j, :w, :][None, :, :])
            rows = []
            for c in range(8):
                k = k0 + c
                base = (mul[k][:w] if mul is not None
                        else _iota_eq((w, NT), 0, k))
                s = acc[c]
                for p in range(c):
                    lkp = gscr[k0 + p, k, :]           # L[k, k0+p]
                    s = s + rows[p] * lkp[None, :]
                row = (base - s) * dinvs[k][None, :]
                rows.append(row)
                li_scr[k, :w, :] = row
        return
    for k0 in range(0, n_pad, 8):
        ks = (k0 // sup) * sup if limx_scr is not None else 0
        acc = jnp.zeros((8, n_pad, NT), _F32)
        if limx_scr is not None and ks > 0:
            # acc[c, col] = sum_{j<ks} L[k0+c, j] * Li[j, col]
            lrB = gscr[:ks, k0:k0 + 8, :]              # (ks, 8, NT)
            lrm = jnp.transpose(lrB, (2, 0, 1))        # (NT, ks, 8)
            am = jax.lax.dot_general(
                limx_scr[:, :ks, :], lrm,
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=_F32, precision=_HI)
            acc = jnp.transpose(am, (2, 1, 0))         # (8, n_pad, NT)
        if k0 > ks:
            lrB = gscr[ks:k0, k0:k0 + 8, :]            # (k0-ks, 8, NT)
            for j in range(k0 - ks):
                acc = acc + lrB[j][:, None, :] * li_scr[ks + j][None, :, :]
        rows = []
        for c in range(8):
            k = k0 + c
            base = (mul[k] if mul is not None
                    else _iota_eq((n_pad, NT), 0, k))
            s = acc[c]
            for p in range(c):
                lkp = gscr[k0 + p, k, :]               # L[k, k0+p]
                s = s + rows[p] * lkp[None, :]
            row = (base - s) * dinvs[k][None, :]
            rows.append(row)
            li_scr[k, :, :] = row
        if limx_scr is not None:
            rstk = jnp.stack(rows, axis=0)             # (8, n_pad, NT)
            limx_scr[:, k0:k0 + 8, :] = jnp.transpose(rstk, (2, 0, 1))


def _gram_mxu(at, g_scr, n_pad, diag_vec):
    """g_scr <- A^T A + diag(diag_vec) via ONE batched per-node MXU
    dot_general.  ``at`` is the tile in MXU layout (NT, m, n_pad) — each
    node a 2D matrix on the (sublane, lane) axes.  Measured (v5e,
    E=24/F=40): 279 ns/node INCLUDING both cross-layout transposes vs
    530 ns/node for the VPU slab Gram (tools/mxu_probe.py); dot
    precision HIGHEST (f32-true, 6-pass bf16) is free — the dot is not
    MXU-throughput-bound at these sizes.  G is symmetric, so the
    back-transpose to the (col, row, NT) column planes _chol_panels
    expects is just (1, 2, 0)."""
    g = jax.lax.dot_general(
        at, at, (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=_F32, precision=jax.lax.Precision.HIGHEST)
    eye = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
           ).astype(_F32)
    g_scr[:] = (jnp.transpose(g, (1, 2, 0))
                + eye[:, :, None] * diag_vec[:, None, :])


def _solve_kernel(dkp, fgp, k12, ks, cv, fv, neu, vld,
                  wh_ref, wl_ref, wnh_ref, wnl_ref, rn_ref,
                  a_scr, g_scr, li_scr,
                  *, E, F, n, n_pad, m, sweeps, with_neumann, tiny, shift,
                  rounds=2, probe_stop=None):
    from . import df32 as dd

    # ---- unpack the PRECOMPUTED df32 piece planes --------------------
    # The geometric prologue (T1, N x T1, tau exp2/log2, piece masking)
    # runs ONCE per (grid, variable, plan) in the cached gather program
    # (methods/gls._gls_gather_fused) — it was the largest compute
    # block left in the kernel (~430 ns/node) once input DMA proved to
    # overlap compute (tools/r5_overlap_probe.py).  Planes are
    # flattened at sublane-padded stride Kp (aligned slice starts, one
    # contiguous DMA segment per block).  fgp plane order:
    # l1 h0-2/l0-2 | l2 | t1m | tt(=tau*T2) | lbnd(=nL1*bnd) | nmean
    if probe_stop == "noop":
        # PROBE ONLY: touch every input once, no compute — measures the
        # per-grid-step floor (input DMA + step bookkeeping)
        red = (fgp[0][:3] * _F32(0) + dkp[0][:1]
               + ks[0][:1].astype(_F32)
               + cv[0][:1] + fv[0][:3] + neu[0]
               + vld[0] + k12[0][:3].astype(_F32))   # (3, NT)
        wh_ref[0] = jnp.broadcast_to(red[:1], (E, NT))
        wl_ref[0] = jnp.broadcast_to(red[1:2], (E, NT))
        wnh_ref[0] = red[:1]
        wnl_ref[0] = red[1:2]
        rn_ref[0] = red[2:3]
        return

    Fp = -(-F // 8) * 8
    Ep = -(-E // 8) * 8
    fg_ = fgp[0]                                     # (24|32 *Fp, NT)
    dk_ = dkp[0]                                     # (6*Ep, NT)
    fpl = lambda c: fg_[c * Fp:c * Fp + F]           # (F, NT)
    k1 = k12[0][:F]                                  # (F, NT) i32
    k2 = k12[0][Fp:Fp + F]
    ks0 = ks[0]                                      # (E, NT) i32
    cvb = cv[0] > 0
    fvb = fv[0] > 0
    isneu = neu[0][0] > 0                            # (NT,)
    valid = vld[0][0] > 0

    interior = fvb & (k2 >= 0)
    bnd = fvb & (k2 < 0)
    cv0 = cvb.astype(_F32)                           # (E, NT)
    n_face = jnp.sum(fvb.astype(_F32), axis=0)       # (NT,)
    n_bface = jnp.sum(bnd.astype(_F32), axis=0)
    active = valid & ~(n_bface >= n_face)            # gls.pyx:266
    af0 = active.astype(_F32)[None, :]               # (1, NT)

    # int literals MUST be pinned to i32: under x64 a bare python int
    # traces as a weak i64 constant, and Mosaic's i64->i32 convert
    # falls into infinite _convert_helper recursion at lowering
    zi = jnp.int32(0)
    k1c = jnp.where(interior, k1, zi)
    k2c = jnp.where(interior, k2, zi)
    m2 = interior[:, None, :] & cvb[None, :, :]      # shared (F, E, NT)
    S1 = ((ks0[None, :, :] == k1c[:, None, :]) & m2).astype(_F32)
    S2 = ((ks0[None, :, :] == k2c[:, None, :]) & m2).astype(_F32)

    # pieces from the precomputed planes (masks already applied in the
    # gather program; lbnd/nmean carry the bnd mask, the per-variable
    # isneu factor is applied here — exact 0/1 mask products, so
    # (x*bnd)*isneu is bit-identical to the former x*(bnd&isneu))
    dk = [(dk_[c * Ep:c * Ep + E], dk_[(3 + c) * Ep:(3 + c) * Ep + E])
          for c in range(3)]
    l1 = [(fpl(c), fpl(3 + c)) for c in range(3)]
    l2 = [(fpl(6 + c), fpl(9 + c)) for c in range(3)]
    t1m = [(fpl(12 + c), fpl(15 + c)) for c in range(3)]
    tt = [(fpl(18 + c), fpl(21 + c)) for c in range(3)]
    if with_neumann:
        bmask = bnd & isneu[None, :]
        ineu32 = isneu.astype(_F32)[None, :]         # (1, NT)
        owner = jnp.where(bmask, k1, jnp.int32(0))
        Sb = ((ks0[None, :, :] == owner[:, None, :]) & bmask[:, None, :]
              & cvb[None, :, :]).astype(_F32)
        # nLb == nL1 bit-exactly (both are perm[first_cell] @ N)
        lb = [(fpl(24 + c) * ineu32, fpl(27 + c) * ineu32)
              for c in range(3)]
        nm = (fpl(30) * ineu32, fpl(31) * ineu32)
    else:
        Sb = None
        lb = None
        nm = None
    dS = S2 - S1
    msk = cv0 * af0                                  # (E, NT)

    # ---- assemble the FACE rows of A (hi parts) in VMEM, permuted
    # basis [x|y|z|const]; columns n..n_pad are zero padding (dead,
    # decoupled by deadm below).  The CELL-row block (E rows, 4
    # nonzeros each: the dk diagonals + the const column) never touches
    # the MXU operands: its Gram/Q/Gram2 contributions fold in closed
    # form on the VPU below — this drops the MXU contraction depth
    # m -> 3F (or 4F) and, decisively, Q's output from TWO 128-row MXU
    # tiles (m = E+3F = 132 at the tetra class) to ONE (round-5
    # attribution: the Q dot was 253 ns/node of a 1707 ns kernel).
    # Only the padding columns need the upfront zero fill: every row of
    # columns 0..3E is overwritten by the block writes below, and column
    # 3E's face rows are covered by this fill.  Start at the sublane
    # boundary below 3E so the fill stays aligned for every E class.
    mF = m - E                                       # face rows only
    if probe_stop == "prologue":
        # PROBE ONLY: stop before the assembly writes; outputs derive
        # from every prologue product so none is dead-code-eliminated
        red = jnp.sum(S1 + S2, axis=0)               # (E, NT)
        for c in range(3):
            red = red + dk[c][0] + dk[c][1]
        redf = tt[0][0] + tt[0][1] + l1[0][0] + l2[0][0] + t1m[0][0]
        wh_ref[0] = red
        wl_ref[0] = red * _F32(2)
        wnh_ref[0] = jnp.sum(redf, axis=0)[None, :]
        wnl_ref[0] = jnp.sum(msk, axis=0)[None, :]
        rn_ref[0] = jnp.sum(dS, axis=(0, 1))[None, :]
        return
    z0 = (3 * E // 8) * 8
    a_scr[:, z0:, :] = jnp.zeros((mF, n_pad - z0, NT), _F32)
    eyeE = (jax.lax.broadcasted_iota(jnp.int32, (E, E), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (E, E), 1)).astype(_F32)
    for c in range(3):
        a_scr[0:F, c * E:(c + 1) * E, :] = (
            S2 * l2[c][0][:, None, :]
            - S1 * l1[c][0][:, None, :])
        a_scr[F:2 * F, c * E:(c + 1) * E, :] = (
            dS * t1m[c][0][:, None, :])
        a_scr[2 * F:3 * F, c * E:(c + 1) * E, :] = (
            dS * tt[c][0][:, None, :])
        if with_neumann:
            a_scr[3 * F:4 * F, c * E:(c + 1) * E, :] = (
                -Sb * lb[c][0][:, None, :])

    if probe_stop == "assembly":
        # PROBE ONLY: stop after prologue + assembly; outputs derive
        # from a_scr so nothing upstream is dead-code-eliminated
        red = jnp.sum(a_scr[:], axis=0)              # (n_pad, NT)
        wh_ref[0] = red[:E]
        wl_ref[0] = red[E:2 * E] if n_pad >= 2 * E else red[:E] * _F32(2)
        wnh_ref[0] = red[:1]
        wnl_ref[0] = red[1:2]
        rn_ref[0] = red[2:3]
        return

    # ---- shifted CholQR2 preconditioner.  The three heavy matmul
    # stages (Gram1, Q = A Li1^T, Gram2) run as batched per-node MXU
    # dot_generals on a once-transposed copy of the FACE-row tile;
    # Cholesky, L^{-1} and the df32 sweeps stay in the VPU layout
    # (sequential per-element algebra is where lane-parallelism wins).
    a = a_scr[:]
    d2f = jnp.sum(a * a, axis=0)                       # face column norms
    # cell-row contributions in closed form: column c*E+e gets
    # dk_c[e]^2, the const column gets sum(cv0^2)
    dksq = [dk[c][0] * dk[c][0] for c in range(3)]     # (E, NT)
    cv2 = jnp.sum(cv0 * cv0, axis=0)[None, :]          # (1, NT)
    tail = ([jnp.zeros((n_pad - 3 * E - 1, NT), _F32)]
            if n_pad > 3 * E + 1 else [])
    d2 = d2f + jnp.concatenate(dksq + [cv2] + tail, axis=0)
    deadm = (d2 == 0).astype(_F32)
    D = jax.lax.rsqrt(jnp.where(d2 == 0, _F32(1), d2)) * (1 - deadm)
    a = a * D[None, :, :]
    at = jnp.transpose(a, (2, 0, 1))                   # (NT, mF, n_pad)
    _gram_mxu(at, g_scr, n_pad, deadm + _F32(shift))
    # fold the cell-row block into G in closed form: rows are
    # e_(c*E+e)*dk_c[e] + e_(3E)*cv0[e], so (after the D column
    # normalization) G gains eyeE-diagonal (c, c') blocks, a const
    # column/row, and the const diagonal entry
    dkn = [dk[c][0] * D[c * E:(c + 1) * E, :] for c in range(3)]
    cvn = cv0 * D[3 * E:3 * E + 1, :]                  # (E, NT)
    for ci in range(3):
        for cj in range(3):
            prod = dkn[ci] * dkn[cj]                   # (E, NT)
            g_scr[ci * E:(ci + 1) * E, cj * E:(cj + 1) * E, :] = (
                g_scr[ci * E:(ci + 1) * E, cj * E:(cj + 1) * E, :]
                + eyeE[:, :, None] * prod[:, None, :])
        pc = dkn[ci] * cvn                             # (E, NT)
        g_scr[ci * E:(ci + 1) * E, 3 * E:3 * E + 1, :] = (
            g_scr[ci * E:(ci + 1) * E, 3 * E:3 * E + 1, :]
            + pc[:, None, :])
        g_scr[3 * E:3 * E + 1, ci * E:(ci + 1) * E, :] = (
            g_scr[3 * E:3 * E + 1, ci * E:(ci + 1) * E, :]
            + pc[None, :, :])
    g_scr[3 * E:3 * E + 1, 3 * E:3 * E + 1, :] = (
        g_scr[3 * E:3 * E + 1, 3 * E:3 * E + 1, :]
        + jnp.sum(cvn * cvn, axis=0)[None, None, :])

    def _probe_emit(red, tag):
        # PROBE ONLY: write outputs derived from ``red`` (n_pad, NT)
        wh_ref[0] = red[:E]
        wl_ref[0] = red[:E] * _F32(2)
        wnh_ref[0] = red[:1]
        wnl_ref[0] = red[1:2]
        rn_ref[0] = red[2:3]

    if probe_stop == "gram1":
        _probe_emit(jnp.sum(g_scr[:], axis=0), "gram1")
        return
    # chol/linv stay ALL-VPU (lt_scr/limx_scr=None): the MXU super-panel
    # folds were built and measured (tools/chol_mxu_probe.py, round 4)
    # and LOSE — 781-1850 ns/node vs 636 for this baseline at (E=24,
    # n_pad=80): batched sub-128 dot_generals cost ~100+ ns/node EACH in
    # Mosaic dispatch latency + cross-layout relayout, and the VPU form
    # is already near flop-bound.  The MXU-vs-VPU boundary is ~3 big
    # dots per pass (gram/Q win, the 5-10 small fold dots do not).
    # tri=True (triangular-restricted passes) halves the VPU flops and
    # measured 591 -> 301 ns/node for chol+linv on v5e, bitwise
    # identical (tools/chol_tri_probe.py, round 4).
    dinv1 = _chol_panels(g_scr, n_pad, tiny, tri=True)
    _linv_rows(g_scr, li_scr, n_pad, dinv1, tri=True)
    li1 = li_scr[:]
    if probe_stop == "chol1":
        _probe_emit(jnp.sum(li1, axis=0) + dinv1[0][None, :], "chol1")
        return
    dmax = jnp.zeros((NT,), _F32)
    if rounds >= 2:
        # Q = A Li1^T never materializes outside registers/VMEM values:
        # it feeds straight into the round-2 Gram (the q_scr scratch of
        # the slab design is gone)
        qt = jax.lax.dot_general(
            at, jnp.transpose(li1, (2, 0, 1)),
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=_F32,
            precision=jax.lax.Precision.HIGHEST)       # (NT, mF, n_pad)
        if probe_stop == "q":
            _probe_emit(jnp.transpose(jnp.sum(qt, axis=1), (1, 0)), "q")
            return
        # cell-row block of Q in closed form:
        # q_top[e, j] = sum_c dkn_c[e] Li1[j, cE+e] + cvn[e] Li1[j, 3E]
        qv = None
        for c in range(3):
            t = li1[:, c * E:(c + 1) * E, :] * dkn[c][None, :, :]
            qv = t if qv is None else qv + t           # (n_pad, E, NT)
        qv = qv + li1[:, 3 * E:3 * E + 1, :] * cvn[None, :, :]
        qtop = jnp.transpose(qv, (2, 1, 0))            # (NT, E, n_pad)
        g2 = jax.lax.dot_general(
            qt, qt, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32, precision=_HI)
        g2 = g2 + jax.lax.dot_general(
            qtop, qtop, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=_F32, precision=_HI)
        eye2 = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
                == jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
                ).astype(_F32)
        g_scr[:] = (jnp.transpose(g2, (1, 2, 0))
                    + eye2[:, :, None] * deadm[:, None, :])
        if probe_stop == "gram2":
            _probe_emit(jnp.sum(g_scr[:], axis=0), "gram2")
            return
        # The round-2 factor L2 is used by Mapply through triangular
        # SOLVES (O(n^2) per vector); the explicit combined inverse
        # Lc = L2^{-1} Li1 of the earlier design cost another
        # _linv_rows pass (~n^3/2 VPU flops/node, the kernel's single
        # largest stage) for no flop savings in the 4 Mapply calls
        # (tools/trisolve_probe.py: solves win ~3x).
        dinv2 = _chol_panels(g_scr, n_pad, tiny, tri=True)
        # strictly-below-diagonal L2, column planes, masked once:
        # lm[c, r, :] = L2[r, c] for r > c, else 0
        rgt = (jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 1)
               > jax.lax.broadcasted_iota(jnp.int32, (n_pad, n_pad), 0)
               ).astype(_F32)
        lm = g_scr[:] * rgt[:, :, None]
        d2stk = jnp.concatenate([d[None, :] for d in dinv2], axis=0)
        # breakdown detection looks at BOTH rounds: diag(Li1) = dinv1
        # and diag(Lc) = dinv1*dinv2 — a clamped round-1 pivot could
        # cancel against a tiny round-2 diagonal in the combined factor.
        for k in range(n_pad):
            dmax = jnp.maximum(dmax, dinv1[k])
            dmax = jnp.maximum(dmax, dinv1[k] * dinv2[k])
    else:
        # single-round shifted CholQR: ~45% less preconditioner work;
        # residual contraction is ~eps32*cond(A) instead of
        # cond-independent, so more sweeps are run and ill-conditioned
        # nodes surface through rnorm -> the exact fallback.
        for k in range(n_pad):
            dmax = jnp.maximum(dmax, dinv1[k])

    if probe_stop == "precond":
        # PROBE ONLY: stop after the full preconditioner build
        red = jnp.sum(li1, axis=0)                   # (n_pad, NT)
        if rounds >= 2:
            red = red + jnp.sum(lm, axis=0) + d2stk
        wh_ref[0] = red[:E]
        wl_ref[0] = red[:E] + dmax[None, :]
        wnh_ref[0] = red[:1]
        wnl_ref[0] = red[1:2]
        rn_ref[0] = dmax[None, :]
        return

    def Mapply(rh, rl):
        # M v = Li1^T L2^{-T} L2^{-1} Li1 v (rounds=2; M = Li1^T Li1
        # for rounds=1).  Every stage is TRIANGULAR-restricted at 8-row
        # granularity (round 5): Li1's rows and lm's columns are zero
        # beyond the diagonal by construction, so the full-width forms
        # spent half their VPU work multiplying stored zeros.  All
        # slices stay sublane-aligned; the skipped terms are exact
        # zeros (sum-order ulp differences only).
        v = (rh + rl) * D
        us = []
        for k0 in range(0, n_pad, 8):                  # u = Li1 v
            # slice BEFORE adding the new axis: None + partial slice
            # routes through jnp's gather path, which Mosaic rejects
            vw = v[:k0 + 8, :]
            us.append(jnp.sum(li1[k0:k0 + 8, :k0 + 8, :]
                              * vw[None, :, :], axis=1))
        u = jnp.concatenate(us, axis=0)
        if rounds >= 2:
            for k0 in range(0, n_pad, 8):              # u <- L2^{-1} u
                tail = u[k0:, :]
                for c in range(8):
                    xk = tail[c, :] * dinv2[k0 + c]
                    tail = tail - lm[k0 + c][k0:, :] * xk[None, :]
                u = tail if k0 == 0 else jnp.concatenate(
                    [u[:k0, :], tail], axis=0)
            x = u * d2stk
            # y <- L2^{-T} x, built bottom-up in 8-row slabs: row k
            # needs only rows > k of y (lm[k] is zero at rows <= k)
            ytail = None                               # rows k0+8..
            for k0 in range(n_pad - 8, -1, -8):
                rows = [None] * 8
                for c in range(7, -1, -1):
                    k = k0 + c
                    s = jnp.zeros((NT,), _F32)
                    if ytail is not None:
                        s = jnp.sum(lm[k][k0 + 8:, :] * ytail, axis=0)
                    for p in range(c + 1, 8):
                        s = s + lm[k][k0 + p, :] * rows[p]
                    rows[c] = (x[k, :] - s) * dinv2[k]
                slab = jnp.stack(rows, axis=0)         # (8, NT)
                ytail = slab if ytail is None else jnp.concatenate(
                    [slab, ytail], axis=0)
            u = ytail
        w2s = None                                     # w2 = Li1^T u
        for k0 in range(0, n_pad, 8):
            u8 = u[k0:k0 + 8, :]
            part = jnp.sum(li1[k0:k0 + 8, :k0 + 8, :]
                           * u8[:, None, :], axis=0)
            if w2s is None:
                w2s = part
            else:
                w2s = jnp.concatenate(
                    [w2s[:k0, :] + part[:k0, :], part[k0:, :]], axis=0)
        return w2s * D, jnp.zeros((n_pad, NT), _F32)

    # ---- df32 structured operator (permuted basis: component blocks
    # are static slices)
    def yblk(yh, yl, c):
        return yh[c * E:(c + 1) * E], yl[c * E:(c + 1) * E]

    def mul_A(yh, yl):
        tc = None
        for c in range(3):
            p = dd.mul(dk[c], yblk(yh, yl, c))
            tc = p if tc is None else dd.add(tc, p)
        ycn = (jnp.broadcast_to(yh[3 * E:3 * E + 1], (E, NT)),
               jnp.broadcast_to(yl[3 * E:3 * E + 1], (E, NT)))
        tc = dd.add(tc, ycn)
        tc = (tc[0] * msk, tc[1] * msk)
        g1 = [(jnp.sum(S1 * yblk(yh, yl, c)[0][None, :, :], axis=1),
               jnp.sum(S1 * yblk(yh, yl, c)[1][None, :, :], axis=1))
              for c in range(3)]                        # exact one-hots
        g2 = [(jnp.sum(S2 * yblk(yh, yl, c)[0][None, :, :], axis=1),
               jnp.sum(S2 * yblk(yh, yl, c)[1][None, :, :], axis=1))
              for c in range(3)]
        r1 = r2 = r3 = None
        for c in range(3):
            p1 = dd.add(dd.mul(l2[c], g2[c]),
                        dd.neg(dd.mul(l1[c], g1[c])))
            ddc = dd.add(g2[c], dd.neg(g1[c]))
            p2 = dd.mul(t1m[c], ddc)
            p3 = dd.mul(tt[c], ddc)
            r1 = p1 if r1 is None else dd.add(r1, p1)
            r2 = p2 if r2 is None else dd.add(r2, p2)
            r3 = p3 if r3 is None else dd.add(r3, p3)
        r1 = (r1[0] * af0, r1[1] * af0)
        r2 = (r2[0] * af0, r2[1] * af0)
        r3 = (r3[0] * af0, r3[1] * af0)
        tn = None
        if with_neumann:
            for c in range(3):
                go = (jnp.sum(Sb * yblk(yh, yl, c)[0][None, :, :], axis=1),
                      jnp.sum(Sb * yblk(yh, yl, c)[1][None, :, :], axis=1))
                p = dd.mul(lb[c], go)
                tn = p if tn is None else dd.add(tn, p)
            tn = dd.neg(tn)
            tn = (tn[0] * af0, tn[1] * af0)
        return tc, r1, r2, r3, tn

    def scatter(S, p):
        ph = S * p[0][:, None, :]
        pl_ = S * p[1][:, None, :]
        return dd.tree_sum((ph, pl_), axis=0)           # (E, NT)

    def mul_G(yh, yl):
        tc, r1, r2, r3, tn = mul_A(yh, yl)
        blocks_h, blocks_l = [], []
        for c in range(3):
            out = dd.mul(dk[c], tc)
            c1 = dd.neg(dd.add(dd.add(dd.mul(l1[c], r1),
                                      dd.mul(t1m[c], r2)),
                               dd.mul(tt[c], r3)))
            c2 = dd.add(dd.add(dd.mul(l2[c], r1),
                               dd.mul(t1m[c], r2)),
                        dd.mul(tt[c], r3))
            out = dd.add(out, scatter(S1, c1))
            out = dd.add(out, scatter(S2, c2))
            if with_neumann:
                cb = dd.neg(dd.mul(lb[c], tn))
                out = dd.add(out, scatter(Sb, cb))
            blocks_h.append(out[0])
            blocks_l.append(out[1])
        oc = dd.tree_sum(tc, axis=0)                    # (NT,)
        zpad = [jnp.zeros((n_pad - n, NT), _F32)]       # padding rows
        gh = jnp.concatenate(blocks_h + [oc[0][None, :]] + zpad, axis=0)
        gl = jnp.concatenate(blocks_l + [oc[1][None, :]] + zpad, axis=0)
        return gh, gl

    # ---- solve: y0 = M b, then df32 residual sweeps
    bh = _iota_eq((n_pad, NT), 0, n - 1)
    yh, yl = Mapply(bh, jnp.zeros_like(bh))
    dyh = yh
    for _ in range(sweeps):
        gh, gl = mul_G(yh, yl)
        rh, rl = dd.add((bh, jnp.zeros_like(bh)), (-gh, -gl))
        dyh, dyl = Mapply(rh, rl)
        yh, yl = dd.add((yh, yl), (dyh, dyl))

    dy2 = jnp.sum(dyh * dyh, axis=0)
    y2 = jnp.sum(yh * yh, axis=0)
    rn = jnp.sqrt(dy2) * jax.lax.rsqrt(jnp.maximum(y2, _F32(1e-30)))
    rn = jnp.where(dmax > _F32(3e4), _F32(1.0), rn)
    rn_ref[0] = rn[None, :]

    # ---- weights = cell block of mul_A(y); wn = sum nmean * tn
    tc, _, _, _, tn = mul_A(yh, yl)
    wh_ref[0] = tc[0]
    wl_ref[0] = tc[1]
    if with_neumann:
        p = dd.mul(nm, tn)
        s = dd.tree_sum(p, axis=0)
        wnh_ref[0] = s[0][None, :]
        wnl_ref[0] = s[1][None, :]
    else:
        wnh_ref[0] = jnp.zeros((1, NT), _F32)
        wnl_ref[0] = jnp.zeros((1, NT), _F32)


def gls_solve_fused(dkp, fgp, k12, ks, cv, fv, neu, vld,
                    with_neumann, sweeps=3, tiny=1e-12, shift=1.5e-5,
                    rounds=2, probe_stop=None):
    """The GLS mixed-precision solve as ONE Pallas pass per tile.

    Inputs are PRECOMPUTED df32 piece planes (built once per (grid,
    variable, plan) in the cached gather program — methods/gls.
    _gls_gather_fused), flattened at plane stride Kp = ceil(K/8)*8
    (aligned plane starts, one contiguous DMA segment per block):
      dkp (G, 6*Ep, NT) f32   dk = (centroid - x)*cv, hi(3)+lo(3)
      fgp (G, 24*Fp or 32*Fp, NT) f32  l1 | l2 | t1m | tau*T2
                              [| nL1*bnd | nmean*bnd, with_neumann
                              only], each hi(3)+lo(3) (nmean 1+1)
      k12 (G, 2*Fp, NT) i32   esuf pair (k2 < 0 marks boundary)
      ks  (G, E, NT) i32      surrounding cells (clipped)
      cv/fv                   cell/face validity (f32 0/1)
      neu/vld (G, 1, NT)      Neumann flag / bucket-valid flag

    Per tile, entirely in VMEM: one-hot incidence, assembly, shifted
    CholQR2, ``sweeps`` df32 structured-residual refinement sweeps,
    and weight extraction — replacing the per-node LAPACK dgels of the
    reference (gls.pyx:420-474).

    Returns (w_h, w_l (G,E,NT), wn_h, wn_l (G,1,NT), rnorm (G,1,NT)).
    """
    G, E, _ = ks.shape
    F = fv.shape[1]
    Fp = -(-F // 8) * 8
    Ep = -(-E // 8) * 8
    n = 3 * E + 1
    n_pad = -(-n // 8) * 8          # sublane-aligned working width
    m = E + (4 if with_neumann else 3) * F
    kern = functools.partial(_solve_kernel, E=E, F=F, n=n, n_pad=n_pad,
                             m=m, sweeps=sweeps, with_neumann=with_neumann,
                             tiny=tiny, shift=shift, rounds=rounds,
                             probe_stop=probe_stop)
    sp = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (i * 0,) * len(dims),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[sp(6 * Ep, NT),
                  sp((32 if with_neumann else 24) * Fp, NT),
                  sp(2 * Fp, NT),
                  sp(E, NT), sp(E, NT), sp(F, NT), sp(1, NT), sp(1, NT)],
        out_specs=[sp(E, NT), sp(E, NT), sp(1, NT), sp(1, NT),
                   sp(1, NT)],
        out_shape=[jax.ShapeDtypeStruct((G, E, NT), _F32),
                   jax.ShapeDtypeStruct((G, E, NT), _F32),
                   jax.ShapeDtypeStruct((G, 1, NT), _F32),
                   jax.ShapeDtypeStruct((G, 1, NT), _F32),
                   jax.ShapeDtypeStruct((G, 1, NT), _F32)],
        scratch_shapes=[pltpu.VMEM((m - E, n_pad, NT), _F32),
                        pltpu.VMEM((n_pad, n_pad, NT), _F32),
                        pltpu.VMEM((n_pad, n_pad, NT), _F32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(dkp, fgp, k12, ks, cv, fv, neu, vld)


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
