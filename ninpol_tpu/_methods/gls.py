"""GLS (Generalized Least Squares) MPFA-D node interpolation — TPU-native.

Behavioral rebuild of the reference flagship method
(ninpol/_methods/gls.pyx:38-474).  Per node v the reference assembles an
m x n constraint matrix Mi and m x nrhs RHS Ni:

  * one "cell row" per surrounding cell K: [dKv | 1] with unit RHS
    (gls.pyx:269-281),
  * three "flux rows" per interior face S: normal-flux continuity
    (-K1^T N at cell1, +K2^T N at cell2), tangential continuity T_sj1, and
    weighted tangential tau*T_sj2 with tau = ||T_sj2||^(-eta),
    eta = max(diff_mag of the two cells) (gls.pyx:291-356),
  * one Neumann row per boundary face for Neumann nodes: -K^T N at the
    owner cell, RHS = mean neumann value of the face's points
    (gls.pyx:374-416),

then solves min ||Mi x - Ni|| with LAPACK dgels and keeps only the LAST
solution row (the reconstructed value at v) per RHS column
(gls.pyx:466-472).

TPU design (not a port):
  * Nodes are bucketed by stencil size; each bucket is one fixed-shape
    batched kernel (static E = max cells, F = max faces).
  * The ragged structure is replaced by one-hot incidence matrices
    (S1/S2 = cell-of-face selectors), so the whole assembly is dense
    einsum work — no scatters.
  * Zero padding rows are harmless in least squares, so face/Neumann rows
    are NOT compacted (the reference's idx bookkeeping, gls.pyx:337-356,
    disappears); identity regularization rows keep padded gradient columns
    full-rank without perturbing the real solution.
  * Only the last solution row is ever needed.  With the constant column
    moved last, weights_j = y . (A^T e_j) where y solves (A^T A) y = e_n —
    ONE SPD solve per node instead of nrhs least-squares columns, and
    A^T e_j is analytic (the j-th cell row).  y is obtained by the
    matmul-only mixed-precision solver in ops/solve.py (fast path) or by
    float64 Householder QR (exact path, matches dgels rounding).

Reference quirks reproduced (neumann_compat=True, default):
  * the returned neumann weight is read from the last *cell* column, i.e.
    it equals the last cell weight (gls.pyx:470-472 reads column
    w_total-1, not the Neumann column);  neumann_compat=False returns the
    true Neumann-column weight instead.
  * nodes with n_bface >= n_face skip matrix assembly (gls.pyx:266-267);
    the reference then runs dgels on a near-empty system producing
    unspecified values; here such nodes yield zero weights.
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import df32, pallas_qr
from ..ops.pallas_chol import (chol_linv_f32, gram_f32, prec_apply_f32,
                               round2_gram_f32)
from ..ops.solve import (householder_lastrow,
                         solve_normal_refined_ops)


# ---------------------------------------------------------------------------
# Per-bucket kernel
# ---------------------------------------------------------------------------
# Force the fused Pallas path off-TPU (interpret mode) — used by the CPU
# test that pins gls_solve_fused against the oracle without hardware.
_FORCE_FUSED = False


def _gls_gather_raw(nodes, valid, esup2d, esup_cnt, fsup2d, fsup_cnt,
                    point_pack, cell_pack, face_pack, neumann_flag,
                    *, E, F):
    """Stencil gathers shared by every solver path — pure data movement
    plus boolean/int mask logic (NO float arithmetic), so its output
    bits are identical whether it runs fused into a solve program or as
    a standalone pre-gather pass (see _gls_gather_fused).

    XLA TPU gathers cost ~8 cycles/row on small tables but degrade to
    ~44 ns/row when the source table is HBM-large (tools/gather_probe:
    cost tracks the physical table size; alignment/span/sorting don't
    help) — at 1.9M tets these gathers cost MORE than the fused solve
    kernel, which is why prepare() hoists them out of the timed solve
    via the per-(grid, variable, plan) tile cache.

    Everything per-entity comes from ONE packed-row gather (the old 17
    narrow per-array gathers took as long as the entire fused solve
    kernel): point_pack (6 f32), cell_pack (6 f32), face_pack (30 f32,
    layout below)."""
    KSetv = esup2d[nodes, :E]                                   # (B,E)
    n_elem = jnp.minimum(esup_cnt[nodes], E)                    # (B,)
    cell_valid = (jnp.arange(E)[None, :] < n_elem[:, None]) & (KSetv >= 0)
    KS = jnp.where(cell_valid, KSetv, 0)

    Sv = fsup2d[nodes, :F]                                      # (B,F)
    n_face = jnp.minimum(fsup_cnt[nodes], F)
    face_valid = (jnp.arange(F)[None, :] < n_face[:, None]) & (Sv >= 0)
    SF = jnp.where(face_valid, Sv, 0)

    # ONE 30-column gather row per (node, face) — under the 32-f32
    # (128-byte) cap of the TPU gather fast path (a 40-wide row
    # measured 2x slower than TWO narrow gathers).  The row fits by
    # (a) dropping the boundary flag — a boundary face is exactly one
    # with a single adjacent cell, i.e. esuf[1] < 0
    # (topology.py:237-239) — (b) dropping nLb, which is bit-identical
    # to nL1 (both are perm[first_cell] @ N, see precompute_face_data),
    # and (c) carrying the per-face Neumann mean PRECOMPUTED in f64 on
    # the host instead of inpofa + per-face-POINT value gathers (those
    # cost ~8 cycles x 4F scalar rows per node — more than the whole
    # solve kernel).  The barrier pins the single full-row gather:
    # without it XLA fuses the slices below INTO the gather, splitting
    # it into lane-offset gathers that hit a ~50x slower path
    # (measured).
    fpk = face_pack[SF]                                         # (B,F,30)
    fpk = jax.lax.optimization_barrier(fpk)
    # pure data movement (gather + slice) preserves the int bit
    # patterns; no float arithmetic ever touches columns 0:2
    pair = jax.lax.bitcast_convert_type(fpk[:, :, 0:2], jnp.int32)
    fpk = fpk[:, :, 2:]                                         # (B,F,28)
    bnd = pair[:, :, 1] < 0                                     # boundary
    cpk = cell_pack[KS]                                         # (B,E,6)
    ppk = point_pack[nodes]                                     # (B,6)

    is_neu = neumann_flag[nodes] != 0
    n_bface = jnp.sum(face_valid & bnd, axis=1)
    skip_build = n_bface >= n_face                              # gls.pyx:266
    # Dirichlet-boundary nodes are excluded by the caller's bucket mask.
    active = valid & ~skip_build
    return (KS, cell_valid, n_elem, face_valid, n_face, fpk, pair, bnd,
            cpk, ppk, is_neu, active)


def _gls_gather_fused(nodes, valid, esup2d, esup_cnt, fsup2d, fsup_cnt,
                      point_pack, cell_pack, face_pack, neumann_flag,
                      *, E, F, wneu=True):
    """Gather + PRECOMPUTE the fused-path kernel inputs for one chunk.

    The returned 12-tuple is a pure function of (grid topology, variable
    data, bucket plan) — the exact contract of gls._face_cache — so
    prepare() caches it on the plan's unit dicts and the timed solve
    never pays either the HBM-large-table gather cost (~32 ms per 16k
    chunk at 1.9M tets; tools/gather_probe) or the df32 geometric
    prologue (T1, N x T1, the tau exp2/log2 chain, piece masking —
    ~430 ns/node of VPU compute, the round-5 attribution's largest
    block once DMA proved to overlap).  The solve kernel receives the
    finished df32 PIECES (dk, l1, l2, t1m, tau*T2, boundary nL1,
    boundary nmean as hi/lo plane pairs) and keeps only the one-hot
    incidence, masks, assembly and the solve itself.

    Every float op here mirrors the former in-kernel prologue
    element-for-element (same df32 ops, same order), so results are
    unchanged; split vs fused stays bit-identical because both run
    THIS composition.

    Tile layouts (B = chunk nodes, G = B/NT grid steps): component
    planes flattened at sublane-padded stride Kp (see tile_kc).  The
    last four entries stay untiled for the XLA epilogue."""
    f32 = jnp.float32
    from ..ops import df32 as dd
    from ..ops.pallas_chol import NT as _NT
    B = nodes.shape[0]
    Gt = B // _NT
    (KS, cell_valid, n_elem, face_valid, _n_face, fpk, pair, _bnd,
     cpk, ppk, is_neu, active) = _gls_gather_raw(
        nodes, valid, esup2d, esup_cnt, fsup2d, fsup_cnt,
        point_pack, cell_pack, face_pack, neumann_flag, E=E, F=F)

    # ---- df32 geometric pieces, (B, F)/(B, E) layout ---------------
    k2r = pair[:, :, 1]
    fvb = face_valid
    interior = fvb & (k2r >= 0)
    bnd32 = (fvb & (k2r < 0)).astype(f32)            # (B, F)
    im32 = interior.astype(f32)
    cv32 = cell_valid.astype(f32)                    # (B, E)
    col = lambda i: fpk[:, :, i]
    xv = [(ppk[:, c], ppk[:, c + 3]) for c in range(3)]

    def bcF(p):
        return (jnp.broadcast_to(p[0][:, None], (B, F)),
                jnp.broadcast_to(p[1][:, None], (B, F)))

    def bcE(p):
        return (jnp.broadcast_to(p[0][:, None], (B, E)),
                jnp.broadcast_to(p[1][:, None], (B, E)))

    Nf = [(col(c), col(3 + c)) for c in range(3)]
    T1 = [dd.add(bcF(xv[c]), dd.neg((col(6 + c), col(9 + c))))
          for c in range(3)]
    T2 = [dd.add(dd.mul(Nf[i], T1[j]), dd.neg(dd.mul(Nf[j], T1[i])))
          for (i, j) in ((1, 2), (2, 0), (0, 1))]    # N x T1
    t2n2 = dd.mul(T2[0], T2[0])
    for c in (1, 2):
        t2n2 = dd.add(t2n2, dd.mul(T2[c], T2[c]))
    degen = t2n2[0] < f32(1e-30)
    t2h = jnp.where(interior & ~degen, t2n2[0],
                    jnp.where(interior, f32(1e-30), f32(1.0)))
    t2l = jnp.where(interior & ~degen, t2n2[1], f32(0.0))
    eta = (col(24), col(25))
    # tau = ||T2||^(-eta) = exp2(-(eta/2) * log2(||T2||^2))
    tau = dd.exp2(dd.mul(dd.scale(eta, f32(-0.5)),
                         dd.log2((t2h, t2l))))       # (B, F)

    fplanes = []                                     # 32 x (B, F)
    dplanes = []                                     # 6 x (B, E)
    t1m_, tt_, l1_, l2_, lb_ = [], [], [], [], []
    for c in range(3):
        dkc = dd.add((cpk[:, :, c], cpk[:, :, 3 + c]),
                     dd.neg(bcE(xv[c])))
        dplanes.append((dkc[0] * cv32, dkc[1] * cv32))
        l1_.append((col(12 + c) * im32, col(15 + c) * im32))
        l2_.append((col(18 + c) * im32, col(21 + c) * im32))
        t1m_.append((T1[c][0] * im32, T1[c][1] * im32))
        ttc = dd.mul(tau, T2[c])
        tt_.append((ttc[0] * im32, ttc[1] * im32))
        lb_.append((col(12 + c) * bnd32, col(15 + c) * bnd32))
    nm_ = (col(26) * bnd32, col(27) * bnd32)
    # interior-only units (the dominant class) skip the Neumann-only
    # planes entirely: 24-plane fgp vs 32 — the solve never reads them
    # when with_neumann=False, and the tile bytes are the timed path's
    # input stream
    groups = (l1_, l2_, t1m_, tt_) + ((lb_,) if wneu else ())
    for group in groups:
        fplanes.extend([g[0] for g in group])
        fplanes.extend([g[1] for g in group])
    if wneu:
        fplanes.extend([nm_[0], nm_[1]])
    dk_hi_lo = [d[0] for d in dplanes] + [d[1] for d in dplanes]

    def tile_kc(x):
        """(B, K, C) -> (G, C*Kp, NT): component planes FLATTENED onto
        one sublane axis, each plane padded to a sublane multiple (Kp).
        A 4-D (C, K, NT) block with K % 8 != 0 (F=36 at the tetra
        class) makes every plane a strided DMA segment into the padded
        VMEM tiling — measured 8 GB/s vs ~30% faster for the flat
        aligned form (tools/r5_layout_probe.py).  In-kernel, plane c is
        the aligned static slice [c*Kp : c*Kp+K]."""
        K, C = x.shape[1], x.shape[2]
        Kp = -(-K // 8) * 8
        t = jnp.transpose(x.reshape(Gt, _NT, K, C), (0, 3, 2, 1))
        if Kp != K:
            zero = x.dtype.type(0)
            t = jnp.pad(t, ((0, 0), (0, 0), (0, Kp - K), (0, 0)),
                        constant_values=zero)
        return t.reshape(Gt, C * Kp, _NT)

    def tile_k(x):
        return jnp.transpose(x.reshape(Gt, _NT, -1), (0, 2, 1))

    i32 = lambda a: a.astype(jnp.int32)
    fgp = tile_kc(jnp.stack(fplanes, axis=2))        # (G, 32*Fp, NT)
    dkp = tile_kc(jnp.stack(dk_hi_lo, axis=2))       # (G, 6*Ep, NT)
    return (dkp, fgp, tile_kc(pair),
            tile_k(i32(KS)), tile_k(cell_valid.astype(f32)),
            tile_k(face_valid.astype(f32)),
            tile_k(is_neu.astype(f32)[:, None]),
            tile_k(valid.astype(f32)[:, None]),
            active, cell_valid, i32(n_elem), is_neu)


def _gls_solve_fused_tiles(tiles, *, n_refine=2, neumann_compat=True,
                           with_neumann=True, rounds=2):
    """TPU fast path from pre-gathered, PRE-COMPUTED piece tiles:
    one-hot incidence, assembly, shifted CholQR2, refinement sweeps,
    weight extraction — ONE Pallas pass per 128-node tile
    (ops/pallas_chol._solve_kernel) plus the tiny XLA output epilogue.
    The df32 geometric prologue lives in _gls_gather_fused (cached)."""
    f64 = jnp.float64
    from ..ops.pallas_chol import gls_solve_fused
    (dkp_t, fgp_t, pair_t, ks_t, cv_t, fv_t, neu_t, val_t,
     active, cell_valid, n_elem, is_neu) = tiles
    B = active.shape[0]
    wh, wl, wnh, wnl, rnt = gls_solve_fused(
        dkp_t, fgp_t, pair_t, ks_t, cv_t, fv_t, neu_t, val_t,
        with_neumann, rounds=rounds,
        # single-round CholQR contracts the residual by ~eps32*cond(A)
        # per sweep instead of cond-independently, so it runs two extra
        # sweeps
        sweeps=max(n_refine + 1, 2) + (2 if rounds == 1 else 0))

    def untile(x):
        """(G, K, NT) -> (B, K)."""
        return jnp.transpose(x, (0, 2, 1)).reshape(B, -1)

    w = untile(wh).astype(f64) + untile(wl).astype(f64)
    w_neu_correct = (untile(wnh).astype(f64)
                     + untile(wnl).astype(f64))[:, 0]
    rnorm = untile(rnt).astype(f64)[:, 0]
    w = jnp.where(active[:, None] & cell_valid, w, 0.0)
    if neumann_compat:
        # reference reads the last cell column (gls.pyx:472)
        w_neu = jnp.take_along_axis(
            w, jnp.maximum(n_elem - 1, 0)[:, None], axis=1)[:, 0]
    else:
        w_neu = w_neu_correct
    w_neu = jnp.where(active & is_neu, w_neu, 0.0)
    return w, w_neu, jnp.where(active, rnorm, 0.0)


def _gls_bucket_impl(
        nodes, valid,                       # (B,), (B,)
        esup2d, esup_cnt, fsup2d, fsup_cnt,
        point_pack, cell_pack, face_pack,
        neumann_flag,
        *, E, F, n_refine=2, exact=False, neumann_compat=True,
        with_neumann=True, solver="cholqr", fused=False, rounds=2):
    f64 = jnp.float64
    f32 = jnp.float32
    B = nodes.shape[0]
    n = 3 * E + 1

    if fused:
        # ---- TPU fast path: tile the RAW packed gather rows and run
        # EVERYTHING else inside ONE Pallas pass per 128-node tile.
        # Only the gathers and the tiling transposes remain in XLA: the
        # former XLA df32 prologue plus its ~12 per-piece (G,K,3,NT)
        # transposes were ~25% of chunk device time (VERDICT r2 #1).
        # prepare() normally runs the two halves as separate programs
        # with the gather half CACHED per (grid, variable, plan); this
        # single-program composition stays for the sharded/mega/legacy
        # entries and is bit-identical to the split form (both run the
        # SAME gather composition — since round 5 it carries the df32
        # geometric prologue, moved out of the solve kernel).
        tiles = _gls_gather_fused(
            nodes, valid, esup2d, esup_cnt, fsup2d, fsup_cnt,
            point_pack, cell_pack, face_pack, neumann_flag, E=E, F=F,
            wneu=with_neumann)
        return _gls_solve_fused_tiles(
            tiles, n_refine=n_refine, neumann_compat=neumann_compat,
            with_neumann=with_neumann, rounds=rounds)

    # ---- gather stencils -------------------------------------------------
    (KS, cell_valid, n_elem, face_valid, n_face, fpk, pair, bnd,
     cpk, ppk, is_neu, active) = _gls_gather_raw(
        nodes, valid, esup2d, esup_cnt, fsup2d, fsup_cnt,
        point_pack, cell_pack, face_pack, neumann_flag, E=E, F=F)

    interior = face_valid & (pair[:, :, 1] >= 0)
    k1 = jnp.where(interior, pair[:, :, 0], 0)
    k2 = jnp.where(interior, pair[:, :, 1], 0)

    S1 = (KS[:, None, :] == k1[:, :, None]) & interior[:, :, None] \
        & cell_valid[:, None, :]                                # (B,F,E)
    S2 = (KS[:, None, :] == k2[:, :, None]) & interior[:, :, None] \
        & cell_valid[:, None, :]
    Ij1 = jnp.argmax(S1, axis=2)                                # (B,F)
    Ij2 = jnp.argmax(S2, axis=2)

    if with_neumann:
        bmask = face_valid & bnd & is_neu[:, None]
        owner = jnp.where(bmask, pair[:, :, 0], 0)
        Sb = ((KS[:, None, :] == owner[:, :, None])
              & bmask[:, :, None] & cell_valid[:, None, :])
        Ikb = jnp.argmax(Sb, axis=2)

    # ---- float64 prologue (exact path + CPU/legacy solvers) --------------
    # Pieces are reconstructed exactly from the hi/lo pack columns
    # (hi + lo IS the original float64) and computed in f64, so the
    # exact path stays a true dgels-equivalent oracle (tau included:
    # f64 pow here).
    def to64(pk, h0, h1, l0, l1):
        return (pk[..., h0:h1].astype(f64) + pk[..., l0:l1].astype(f64))

    xv = to64(ppk, 0, 3, 3, 6)                                  # (B,3)
    cvf = cell_valid.astype(f64)
    dKv = jnp.where(cell_valid[:, :, None],
                    to64(cpk, 0, 3, 3, 6) - xv[:, None, :], 0.0)
    Nf = to64(fpk, 0, 3, 3, 6)                                  # (B,F,3)
    fc = to64(fpk, 6, 9, 9, 12)
    eta = to64(fpk, 24, 25, 25, 26)[..., 0]
    T1 = xv[:, None, :] - fc                                    # (B,F,3)
    T2 = jnp.cross(Nf, T1)
    T2n = jnp.sqrt(jnp.sum(T2 * T2, axis=2))
    tau_base = jnp.where(interior, jnp.maximum(T2n, 1e-30), 1.0)
    tau = tau_base ** (-eta)

    imask = interior[:, :, None].astype(f64)
    nL1m = to64(fpk, 12, 15, 15, 18) * imask
    nL2m = to64(fpk, 18, 21, 21, 24) * imask
    T1m = T1 * imask
    tauT2m = tau[:, :, None] * T2 * imask

    S1f = S1.astype(f64)
    S2f = S2.astype(f64)

    if with_neumann:
        bm = bmask[:, :, None].astype(f64)
        Sbf = Sb.astype(f64)
        nLbm = to64(fpk, 12, 15, 15, 18) * bm   # nLb == nL1 bit-exactly
        # per-face Neumann mean precomputed in f64 on the host (pack
        # cols 26/27; hi + lo reconstructs the f64 mean bit-exactly)
        nmean = jnp.where(
            bmask, to64(fpk, 26, 27, 27, 28)[..., 0], 0.0)      # (B,F)
    else:
        nmean = jnp.zeros((B, F), f64)

    af = active.astype(f64)

    # ---- structured operator (float64; A itself is never materialized
    # in float64 on the fast path — that cost dominated the kernel) ------
    def mul_A(y):
        """y (B,n) -> row-block images (cells, face r1/r2/r3[, neumann])."""
        y3 = y[:, :3 * E].reshape(B, E, 3)
        yc = y[:, 3 * E]
        t_cell = (jnp.einsum("bec,bec->be", dKv, y3)
                  + yc[:, None]) * cvf * af[:, None]
        g1 = jnp.take_along_axis(y3, Ij1[:, :, None], axis=1)   # (B,F,3)
        g2 = jnp.take_along_axis(y3, Ij2[:, :, None], axis=1)
        r1 = (jnp.einsum("bfc,bfc->bf", nL2m, g2)
              - jnp.einsum("bfc,bfc->bf", nL1m, g1)) * af[:, None]
        d = g2 - g1
        r2 = jnp.einsum("bfc,bfc->bf", T1m, d) * af[:, None]
        r3 = jnp.einsum("bfc,bfc->bf", tauT2m, d) * af[:, None]
        if with_neumann:
            go = jnp.take_along_axis(y3, Ikb[:, :, None], axis=1)
            tn = -jnp.einsum("bfc,bfc->bf", nLbm, go) * af[:, None]
        else:
            tn = None
        return t_cell, r1, r2, r3, tn

    def mul_At(t):
        t_cell, r1, r2, r3, tn = t
        out3 = dKv * t_cell[:, :, None]                         # (B,E,3)
        c1 = -(nL1m * r1[:, :, None] + T1m * r2[:, :, None]
               + tauT2m * r3[:, :, None])
        c2 = (nL2m * r1[:, :, None] + T1m * r2[:, :, None]
              + tauT2m * r3[:, :, None])
        out3 = out3 + jnp.einsum("bfe,bfc->bec", S1f, c1) \
            + jnp.einsum("bfe,bfc->bec", S2f, c2)
        if with_neumann:
            out3 = out3 + jnp.einsum("bfe,bfc->bec", Sbf,
                                     -nLbm * tn[:, :, None])
        out_c = jnp.sum(t_cell, axis=1)
        return jnp.concatenate([out3.reshape(B, 3 * E), out_c[:, None]],
                               axis=1)

    def mul_G(y):
        return mul_At(mul_A(y))

    # ---- assembly (entries are +-piece values placed by 0/1 one-hots,
    # so the hi/lo split of the pieces commutes with assembly) -----------
    def assemble_from(dtype, dKv_, cv_, nL1_, nL2_, T1_, tau_, nLb_):
        cast = lambda a: a.astype(dtype)
        eyeE = jnp.eye(E, dtype=dtype)
        cell_grad = jnp.einsum("ef,bec->befc", eyeE, cast(dKv_))
        cell_rows = jnp.concatenate(
            [cell_grad.reshape(B, E, 3 * E),
             cast(cv_)[:, :, None]], axis=2)                    # (B,E,n)
        rows1 = (jnp.einsum("bfe,bfc->bfec", -cast(S1f), cast(nL1_))
                 + jnp.einsum("bfe,bfc->bfec", cast(S2f), cast(nL2_)))
        dS = cast(S2f) - cast(S1f)
        rows2 = jnp.einsum("bfe,bfc->bfec", dS, cast(T1_))
        rows3 = jnp.einsum("bfe,bfc->bfec", dS, cast(tau_))
        face_rows = jnp.stack([rows1, rows2, rows3], axis=2)
        face_rows = face_rows.reshape(B, 3 * F, 3 * E)
        face_rows = jnp.concatenate(
            [face_rows, jnp.zeros((B, 3 * F, 1), dtype)], axis=2)
        blocks = [cell_rows, face_rows]
        if with_neumann:
            neu_rows = jnp.einsum(
                "bfe,bfc->bfec", -cast(Sbf),
                cast(nLb_)).reshape(B, F, 3 * E)
            neu_rows = jnp.concatenate(
                [neu_rows, jnp.zeros((B, F, 1), dtype)], axis=2)
            blocks.append(neu_rows)
        return jnp.concatenate(blocks, axis=1) \
            * active[:, None, None].astype(dtype)               # (B,m,n)

    _nLb_or_zero = nLbm if with_neumann else jnp.zeros((B, F, 3), f64)

    # ---- df32 structured operator (the float64 emulation above is an
    # order of magnitude slower on TPU; error-free-transform float32
    # pairs hit the same ~2^-44 accuracy at VPU speed) ------------------
    f32 = jnp.float32

    def _split(a):
        h = a.astype(f32)
        return h, (a - h.astype(f64)).astype(f32)

    need_df = (not exact) and solver in ("pallas", "cholqr")
    if need_df:
        dKv_s = _split(dKv)
        nL1_s = _split(nL1m)
        nL2_s = _split(nL2m)
        T1_s = _split(T1m)
        tau_s = _split(tauT2m)
        nLb_s = _split(_nLb_or_zero)
        nmean_s = _split(nmean)
        cv32 = cvf.astype(f32)
        af32 = af.astype(f32)
        S1_32 = S1f.astype(f32)
        S2_32 = S2f.astype(f32)
        Sb_32 = Sbf.astype(f32) if with_neumann else None

    def _dot3(x, y):
        """df32 dot over the trailing 3-axis of (hi, lo) pairs."""
        acc = None
        for c in range(3):
            p = df32.mul((x[0][..., c], x[1][..., c]),
                         (y[0][..., c], y[1][..., c]))
            acc = p if acc is None else df32.add(acc, p)
        return acc

    def _bc3(p):
        """broadcast a (B, X) pair to (B, X, 1) for per-component mults."""
        return p[0][:, :, None], p[1][:, :, None]

    def mul_A_df32(y64):
        yh = y64.astype(f32)
        yl = (y64 - yh.astype(f64)).astype(f32)
        y3h = yh[:, :3 * E].reshape(B, E, 3)
        y3l = yl[:, :3 * E].reshape(B, E, 3)
        tc = _dot3(dKv_s, (y3h, y3l))
        ych = jnp.broadcast_to(yh[:, 3 * E][:, None], tc[0].shape)
        ycl = jnp.broadcast_to(yl[:, 3 * E][:, None], tc[1].shape)
        tc = df32.add(tc, (ych, ycl))
        msk = cv32 * af32[:, None]
        tc = (tc[0] * msk, tc[1] * msk)
        gat = lambda a, idx: jnp.take_along_axis(a, idx[:, :, None], axis=1)
        g1 = (gat(y3h, Ij1), gat(y3l, Ij1))
        g2 = (gat(y3h, Ij2), gat(y3l, Ij2))
        r1 = df32.add(_dot3(nL2_s, g2), df32.neg(_dot3(nL1_s, g1)))
        dd = df32.add(g2, df32.neg(g1))
        r2 = _dot3(T1_s, dd)
        r3 = _dot3(tau_s, dd)
        am = af32[:, None]
        r1 = (r1[0] * am, r1[1] * am)
        r2 = (r2[0] * am, r2[1] * am)
        r3 = (r3[0] * am, r3[1] * am)
        if with_neumann:
            go = (gat(y3h, Ikb), gat(y3l, Ikb))
            tn = df32.neg(_dot3(nLb_s, go))
            tn = (tn[0] * am, tn[1] * am)
        else:
            tn = None
        return tc, r1, r2, r3, tn

    def mul_At_df32(t):
        tc, r1, r2, r3, tn = t
        out3 = df32.mul(dKv_s, _bc3(tc))
        t123 = df32.add(df32.add(df32.mul(nL1_s, _bc3(r1)),
                                 df32.mul(T1_s, _bc3(r2))),
                        df32.mul(tau_s, _bc3(r3)))
        c1 = df32.neg(t123)
        c2 = df32.add(df32.add(df32.mul(nL2_s, _bc3(r1)),
                               df32.mul(T1_s, _bc3(r2))),
                      df32.mul(tau_s, _bc3(r3)))

        def scatter(S32, c):
            # one-hot placement is exact in f32; the F-accumulation runs
            # as a compensated pairwise df32 reduction
            ph = c[0][:, :, None, :] * S32[:, :, :, None]
            plo = c[1][:, :, None, :] * S32[:, :, :, None]
            return df32.tree_sum((ph, plo), axis=1)          # (B, E, 3)

        out3 = df32.add(out3, scatter(S1_32, c1))
        out3 = df32.add(out3, scatter(S2_32, c2))
        if with_neumann:
            cb = df32.neg(df32.mul(nLb_s, _bc3(tn)))
            out3 = df32.add(out3, scatter(Sb_32, cb))
        outc = df32.tree_sum(tc, axis=1)                     # (B,)
        oh = jnp.concatenate([out3[0].reshape(B, 3 * E),
                              outc[0][:, None]], axis=1)
        ol = jnp.concatenate([out3[1].reshape(B, 3 * E),
                              outc[1][:, None]], axis=1)
        return oh.astype(f64) + ol.astype(f64)

    def mul_G_df32(y64):
        return mul_At_df32(mul_A_df32(y64))


    def assemble(dtype):
        return assemble_from(dtype, dKv, cvf, nL1m, nL2m, T1m, tauT2m,
                             _nLb_or_zero)

    # ---- solve -----------------------------------------------------------
    if exact:
        A = assemble(f64)
        # The Householder last-row formula requires the diagonal to stay
        # positionally aligned: a zero (padding) column contributes no
        # reflector, so later columns' row masks (rows >= k) would leave
        # uneliminated entries and corrupt R[n-1, n-1].  Identity
        # regularization rows for the padded columns restore alignment.
        pad_col = (jnp.arange(3 * E)[None, :] >= 3 * n_elem[:, None])
        reg_rows = jnp.einsum(
            "bk,kl->bkl", pad_col.astype(f64), jnp.eye(3 * E, dtype=f64))
        reg_rows = jnp.concatenate(
            [reg_rows, jnp.zeros((B, 3 * E, 1), f64)], axis=2)
        A = jnp.concatenate([A, reg_rows], axis=1)
        m = A.shape[1]
        rhs_cells = jnp.concatenate(
            [jnp.eye(E, dtype=f64)[None, :, :]
             * cvf[:, :, None] * active[:, None, None],
             jnp.zeros((B, m - E, E), f64)], axis=1)            # (B,m,E)
        rhs_neu = jnp.zeros((B, m, 1), f64)
        if with_neumann:
            rhs_neu = rhs_neu.at[:, E + 3 * F:E + 4 * F, 0].set(
                nmean * active[:, None])
        Aug = jnp.concatenate([A, rhs_cells, rhs_neu], axis=2)
        last = householder_lastrow(Aug, n)
        w = last[:, :E]
        w_neu_correct = last[:, E]
        rnorm = jnp.zeros((B,), f64)
    elif solver == "cholqr":
        # Shifted CholeskyQR2 (f32, MXU) preconditioner + df32 structured
        # refinement sweeps.  CholQR2's property: the preconditioner
        # residual is ~eps32*sqrt(m) INDEPENDENT of cond(A) (up to the
        # f32 breakdown point), because round 2 re-orthonormalizes the
        # explicitly formed Q1 = A R1^{-1}.  Each df32 sweep then
        # contracts the solve error by that factor, reaching dgels-level
        # accuracy in `n_refine + 1` sweeps.  Replaces per-node LAPACK
        # dgels (gls.pyx:420-474) with batched MXU matmuls.
        #
        # diag(G1) == 1 after column equilibration, so a constant shift
        # of ~128*eps32 suffices (shifted CholQR: keeps the first
        # factorization positive definite past cond(A) ~ 1/sqrt(eps32);
        # round 2 heals the shift-induced distortion).  Dead (padding)
        # columns get a decoupled unit diagonal — their equilibrated
        # columns are exactly zero, so no coupling to real columns.
        # (the TPU fused-kernel variant of this algorithm took the early
        # `fused` branch above; this is the LAPACK-backed composition)
        Ah = assemble_from(f32, dKv_s[0], cvf, nL1_s[0], nL2_s[0],
                           T1_s[0], tau_s[0], nLb_s[0])
        d2 = jnp.einsum("bmn,bmn->bn", Ah, Ah)
        deadc = d2 == 0
        D32 = jnp.where(deadc, f32(0),
                        jax.lax.rsqrt(jnp.where(deadc, f32(1), d2)))
        As = Ah * D32[:, None, :]
        eyen = jnp.eye(n, dtype=f32)[None]
        G1 = gram_f32(As) + eyen * (deadc.astype(f32)
                                    + f32(1.5e-5))[:, :, None]
        Li1 = chol_linv_f32(G1)
        G2 = (round2_gram_f32(As, Li1)
              + eyen * deadc.astype(f32)[:, :, None])
        # fused: Lc = L2^{-1} @ Li1, so M r = Lc^T (Lc r) — one
        # combined factor, one application pass per sweep
        Lc = chol_linv_f32(G2, mul_right=Li1)
        dmax = jnp.maximum(
            jnp.max(jnp.abs(jnp.diagonal(Li1, axis1=1, axis2=2)),
                    axis=1),
            jnp.max(jnp.abs(jnp.diagonal(Lc, axis1=1, axis2=2)),
                    axis=1))
        D = D32.astype(f64)

        def M(r64):
            v = (r64 * D).astype(f32)
            v = prec_apply_f32(Lc, v)
            return v.astype(f64) * D

        sick = dmax > f32(3e4)
        b = jnp.zeros((B, n), f64).at[:, n - 1].set(1.0)
        y = M(b)
        dy = y
        for _ in range(max(n_refine + 1, 2)):
            r = b - mul_G_df32(y)
            dy = M(r)
            y = y + dy
        rnorm = jnp.sqrt(jnp.sum(dy * dy, axis=1)) / jnp.maximum(
            jnp.linalg.norm(y, axis=1), 1e-300)
        rnorm = jnp.where(sick, jnp.ones_like(rnorm), rnorm)
    elif solver == "pallas":
        # df32 (double-float32) QR + semi-normal solve in Pallas VMEM
        # kernels + ONE float64 structured correction (CSNE): reaches
        # ~eps64*cond(A) like dgels, at float32 speed.  The hi/lo piece
        # split is exact, so (Ah + Al) == A to full f64 precision.
        dKv_h, dKv_l = dKv_s
        nL1_h, nL1_l = nL1_s
        nL2_h, nL2_l = nL2_s
        T1_h, T1_l = T1_s
        tau_h, tau_l = tau_s
        nLb_h, nLb_l = nLb_s
        Ah = assemble_from(f32, dKv_h, cvf, nL1_h, nL2_h, T1_h, tau_h,
                           nLb_h)
        Al = assemble_from(f32, dKv_l, jnp.zeros_like(cvf), nL1_l, nL2_l,
                           T1_l, tau_l, nLb_l)
        # dead (padding) columns: APPENDED identity rows keep the
        # Householder diagonal aligned without coupling padding columns
        # to real rows (such columns never reach the weights — their
        # cells have dKv = 0 and cvf = 0 in mul_A)
        dead = jnp.einsum("bmn,bmn->bn", Ah, Ah) == 0
        reg = jnp.eye(n, dtype=f32)[None] * dead[:, None, :].astype(f32)
        Ah = jnp.concatenate([Ah, reg], axis=1)
        Al = jnp.concatenate([Al, jnp.zeros_like(reg)], axis=1)
        # pad rows to the kernel's row-block multiple
        mrows = Ah.shape[1]
        pad = (-mrows) % pallas_qr.MB
        if pad:
            Ah = jnp.pad(Ah, ((0, 0), (0, pad), (0, 0)))
            Al = jnp.pad(Al, ((0, 0), (0, pad), (0, 0)))

        Rh, Rl = pallas_qr.qr_r_df32(Ah, Al)
        b32 = jnp.zeros((B, n), f32).at[:, n - 1].set(1.0)
        yh, yl = pallas_qr.sne_solve_df32(Rh, Rl, b32,
                                          jnp.zeros_like(b32))
        y = yh.astype(f64) + yl.astype(f64)

        b = jnp.zeros((B, n), f64).at[:, n - 1].set(1.0)
        r = b - mul_G(y)
        rh = r.astype(f32)
        rl = (r - rh.astype(f64)).astype(f32)
        dyh, dyl = pallas_qr.sne_solve_df32(Rh, Rl, rh, rl)
        dy = dyh.astype(f64) + dyl.astype(f64)
        y = y + dy
        rnorm = jnp.sqrt(jnp.sum(dy * dy, axis=1)) / jnp.maximum(
            jnp.linalg.norm(y, axis=1), 1e-300)
        # near-singular systems -> exact fallback (dgels pick differs)
        rnorm = jnp.where(pallas_qr.r_diag_quality(Rh) < 1e-6, 1.0, rnorm)
    else:
        A32 = assemble(jnp.float32)
        b = jnp.zeros((B, n), f64).at[:, n - 1].set(1.0)
        y, rnorm = solve_normal_refined_ops(A32, b, mul_G,
                                            n_refine=n_refine)

    if not exact:
        # weights_j = (cell row j) . y — exactly mul_A(y)'s cell block;
        # true neumann weight = sum_f nmean * (neumann row f . y)
        if need_df:
            # df32 arithmetic: same ~2^-44 accuracy as the (emulated)
            # float64 ops at a fraction of the TPU cost
            tc, _, _, _, tn = mul_A_df32(y)
            w = tc[0].astype(f64) + tc[1].astype(f64)
            if with_neumann:
                p = df32.mul(nmean_s, tn)
                sh, sl = df32.tree_sum(p, axis=1)
                w_neu_correct = sh.astype(f64) + sl.astype(f64)
            else:
                w_neu_correct = jnp.zeros((B,), f64)
        else:
            t_cell, _, _, _, tn = mul_A(y)
            w = t_cell
            if with_neumann:
                w_neu_correct = jnp.sum(nmean * tn, axis=1)
            else:
                w_neu_correct = jnp.zeros((B,), f64)

    w = jnp.where(active[:, None] & cell_valid, w, 0.0)
    if neumann_compat:
        # reference reads the last cell column (gls.pyx:472)
        last_cell = jnp.take_along_axis(
            w, jnp.maximum(n_elem - 1, 0)[:, None], axis=1)[:, 0]
        w_neu = last_cell
    else:
        w_neu = w_neu_correct
    w_neu = jnp.where(active & is_neu, w_neu, 0.0)
    return w, w_neu, jnp.where(active, rnorm, 0.0)


# Single-chip entry: one jit per static (E, F, ...) class.
_gls_bucket_kernel = partial(
    jax.jit, static_argnames=("E", "F", "n_refine", "exact",
                              "neumann_compat", "with_neumann",
                              "solver", "fused", "rounds"))(_gls_bucket_impl)


# Scan-stacked entry: S identical-shape chunks of one bucket class run
# as ONE program (lax.scan over the stacked chunk axis).  Through this
# environment's remote helper every separate dispatch leaves the device
# idle ~30 ms (tools/bucket_attrib_probe.py) — ~20 interior chunks at
# 1.9M tets is ~0.6 s of pure gap; inside the scan the chunk bodies run
# back-to-back with no host round-trips.  This is the safe alternative
# to bigger Pallas grids: the (E=24,F=36,B=32768) fused kernel
# MISCOMPILES (see chunk_elems below), while scan keeps B=16384 per
# iteration and only changes the XLA control flow AROUND the kernel.
@partial(jax.jit, static_argnames=("E", "F", "n_refine", "exact",
                                   "neumann_compat", "with_neumann",
                                   "solver", "fused", "rounds"))
def _gls_bucket_scan(nodes_s, valid_s, esup2d, esup_cnt, fsup2d, fsup_cnt,
                     point_pack, cell_pack, face_pack, neumann_flag,
                     **statics):
    def body(c, nv):
        nodes, valid = nv
        return c, _gls_bucket_impl(
            nodes, valid, esup2d, esup_cnt, fsup2d, fsup_cnt,
            point_pack, cell_pack, face_pack, neumann_flag, **statics)

    _, (w, wn, rn) = jax.lax.scan(body, 0, (nodes_s, valid_s))
    S, B = nodes_s.shape
    # flattened (S*B, ...) outputs: downstream consolidation treats the
    # whole stack as one bucket covering the concatenated positions
    return w.reshape(S * B, w.shape[2]), wn.reshape(S * B), rn.reshape(S * B)


# Split fused-path entries: prepare() caches the gather half's output
# per (grid, variable, plan) — see _gls_gather_fused — so the TIMED
# solve runs only the second half.  Scan variants stack identical-shape
# chunks exactly like _gls_bucket_scan; the tiles ride the scan xs with
# a leading S axis, so each scan step slices one chunk's tiles as
# contiguous leading-axis blocks (one DMA per operand, see the
# (G, ..., NT) shaping rule in CLAUDE.md).
_gls_gather_j = partial(
    jax.jit, static_argnames=("E", "F", "wneu"))(_gls_gather_fused)
_gls_solve_tiles_j = partial(
    jax.jit, static_argnames=("n_refine", "neumann_compat",
                              "with_neumann", "rounds"))(
    _gls_solve_fused_tiles)


@partial(jax.jit, static_argnames=("E", "F", "wneu"))
def _gls_gather_scan(nodes_s, valid_s, esup2d, esup_cnt, fsup2d,
                     fsup_cnt, point_pack, cell_pack, face_pack,
                     neumann_flag, *, E, F, wneu=True):
    def body(c, nv):
        nodes, valid = nv
        return c, _gls_gather_fused(
            nodes, valid, esup2d, esup_cnt, fsup2d, fsup_cnt,
            point_pack, cell_pack, face_pack, neumann_flag, E=E, F=F,
            wneu=wneu)

    _, tiles = jax.lax.scan(body, 0, (nodes_s, valid_s))
    return tiles


@partial(jax.jit, static_argnames=("plan_sig",))
def _gls_gather_plan(nodes_list, valid_list, esup2d, esup_cnt, fsup2d,
                     fsup_cnt, point_pack, cell_pack, face_pack,
                     neumann_flag, *, plan_sig):
    """ONE program gathering EVERY unit of a plan (gather + prologue +
    tile — bit-identical to the per-unit programs: the same op
    sequence, and XLA does not reassociate FP).  Each distinct
    per-unit gather shape is otherwise
    its own executable at ~10 s of load through this environment's
    remote helper even fully cached; the gathers run once per (grid,
    variable, plan) — the tile-cache contract — so merging them costs
    nothing in the timed solve path.  Used on TPU only (the per-unit
    programs ride the shape ladder across mesh scales, which keeps the
    CPU suite's compile count bounded); NINPOL_TPU_MERGED_GATHER=1
    forces it elsewhere, NINPOL_TPU_PER_UNIT_GATHER=1 disables it.

    plan_sig: tuple of (E, F, S, wneu) per unit, S == 1 for single
    chunks (then nodes/valid have no leading stack axis)."""
    out = []
    for nodes, valid, (E, F, S, wneu) in zip(nodes_list, valid_list,
                                             plan_sig):
        if S == 1:
            out.append(_gls_gather_fused(
                nodes, valid, esup2d, esup_cnt, fsup2d, fsup_cnt,
                point_pack, cell_pack, face_pack, neumann_flag,
                E=E, F=F, wneu=wneu))
        else:
            def body(c, nv, E=E, F=F, wneu=wneu):
                n, v = nv
                return c, _gls_gather_fused(
                    n, v, esup2d, esup_cnt, fsup2d, fsup_cnt,
                    point_pack, cell_pack, face_pack, neumann_flag,
                    E=E, F=F, wneu=wneu)

            _, tiles = jax.lax.scan(body, 0, (nodes, valid))
            out.append(tiles)
    return tuple(out)


@partial(jax.jit, static_argnames=("n_refine", "neumann_compat",
                                   "with_neumann", "rounds"))
def _gls_solve_tiles_scan(tiles_s, *, n_refine, neumann_compat,
                          with_neumann, rounds):
    def body(c, tiles):
        return c, _gls_solve_fused_tiles(
            tiles, n_refine=n_refine, neumann_compat=neumann_compat,
            with_neumann=with_neumann, rounds=rounds)

    _, (w, wn, rn) = jax.lax.scan(body, 0, tiles_s)
    S, B = w.shape[0], w.shape[1]
    return w.reshape(S * B, w.shape[2]), wn.reshape(S * B), rn.reshape(S * B)


def _build_scan_units(all_buckets):
    """Group identical-shape chunks into scan stacks (shared builder:
    device_grid.build_scan_units; groups snap UP to the ladder with
    all-invalid dummy chunks, so no single-dispatch programs survive).
    Kept as a module attribute so tests can spy on the scan path."""
    from .device_grid import build_scan_units
    return build_scan_units(all_buckets, extra_keys=("with_neumann",))

# Multi-chip entry: the SAME kernel body under jax.shard_map — the node
# batch is sharded over the mesh's "nodes" axis, all grid/face arrays
# are replicated (per-node weights are node-local, SURVEY §2.3: stencil
# gathers stay device-local; XLA inserts no collectives).  This is the
# TPU-native analogue of adding OpenMP threads in the reference.
_N_REPLICATED_ARGS = 8      # every positional arg after (nodes, valid)
_sharded_cache = {}


def _gls_bucket_sharded(mesh, statics):
    """jit(shard_map(kernel)) for a device mesh, cached per (mesh,
    statics).  ``statics`` is the hashable tuple of the kernel's static
    kwargs."""
    key = (mesh, statics)
    fn = _sharded_cache.get(key)
    if fn is None:
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        body = partial(_gls_bucket_impl, **dict(statics))
        nspec = P(axis)
        in_specs = (nspec, nspec) + (P(),) * _N_REPLICATED_ARGS
        out_specs = (nspec, nspec, nspec)
        fn = jax.jit(jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                   out_specs=out_specs))
        _sharded_cache[key] = fn
    return fn


# ---------------------------------------------------------------------------
# Consolidated output assembly: ONE jitted program per prepare() call
# (plus one per host-delivery group) instead of eager per-bucket
# pad/concat/scatter ops.  Through this environment's remote helper an
# executable LOAD costs ~10 s per program even fully cached, so the
# ~dozen tiny eager programs of the per-bucket tail dominated process
# warm-start; fusing them also removes ~2 dispatch round-trips per
# bucket from the critical path.
# ---------------------------------------------------------------------------
def _pad_rows_j(w, wn, ncols_out):
    ncols = min(w.shape[1], ncols_out)
    return jnp.concatenate([
        w[:, :ncols],
        jnp.zeros((w.shape[0], ncols_out - ncols), w.dtype),
        wn[:, None]], axis=1)


@partial(jax.jit, static_argnames=("tol", "n_target"))
def _consolidate_rnorm(rns, pos_flat, *, tol, n_target):
    """Scatter per-bucket rnorm vectors into one (n_target,) array and
    count unconverged nodes (NaN-safe: not provably converged counts).
    pos_flat is ALL buckets' positions in one array (one device upload
    instead of one ~70 ms transfer per bucket); per-bucket slices are
    static from the rn shapes.  tol is static: it bakes the comparison
    constant into the program (callers pass a plain float)."""
    rndev = jnp.zeros((n_target,), jnp.float64)
    off = 0
    for rn in rns:
        rndev = rndev.at[pos_flat[off:off + rn.shape[0]]].set(
            rn, mode="drop")
        off += rn.shape[0]
    return rndev, jnp.sum(~(rndev <= tol))


@partial(jax.jit, static_argnames=("tol", "ncols_out", "n_target"))
def _consolidate_device(parts, pos_flat, rns, *, tol, ncols_out,
                        n_target):
    """device_out path: scatter all bucket rows into ONE consolidated
    (n_target, ncols_out + 1) float64 [weights | neumann] array, plus
    the rnorm consolidation — a single program per bucket plan."""
    rndev = jnp.zeros((n_target,), jnp.float64)
    wdev = jnp.zeros((n_target, ncols_out + 1), jnp.float64)
    off = 0
    for (w, wn), rn in zip(parts, rns):
        p = pos_flat[off:off + rn.shape[0]]
        off += rn.shape[0]
        rndev = rndev.at[p].set(rn, mode="drop")
        wdev = wdev.at[p].set(_pad_rows_j(w, wn, ncols_out), mode="drop")
    return wdev, rndev, jnp.sum(~(rndev <= tol))


@partial(jax.jit, static_argnames=("plan_sig", "kern_sig", "tol",
                                   "ncols_out", "n_target"))
def _run_plan_device(nodes_list, valid_list, esup2d, esup_cnt, fsup2d,
                     fsup_cnt, point_pack, cell_pack, face_pack,
                     neumann_flag, pos_flat, *, plan_sig, kern_sig, tol,
                     ncols_out, n_target):
    """ONE program for the WHOLE non-exact device_out bucket plan: every
    scan unit's kernels AND the output consolidation (the inner jitted
    wrappers inline).  Every dispatch boundary through this
    environment's remote helper leaves the device idle ~30-70 ms
    (relay-day dependent): at 1.9M tets the 5-dispatch plan spent
    ~0.3 s of its 1.16 s device-complete time between programs.
    Keyed by the full plan signature — plan_sig is a tuple of
    (E, F, S, B, with_neumann) per unit, kern_sig the shared kernel
    statics.  OPT-IN via NINPOL_TPU_MEGA=1 — measured SLOWER than
    per-unit dispatch on this environment's helper (1.275 vs 1.161 s
    device-complete at 1.9M tets: the post-scan-stacking dispatch
    boundaries pipeline well, so the fusion only added copies)."""
    n_refine, neumann_compat, solver, fused, rounds = kern_sig
    parts, rns = [], []
    for (E, F, S, B, wneu), ns, vs in zip(plan_sig, nodes_list,
                                          valid_list):
        kw = dict(E=E, F=F, n_refine=n_refine, exact=False,
                  neumann_compat=neumann_compat, with_neumann=wneu,
                  solver=solver, fused=fused, rounds=rounds)
        if S == 1:
            w, wn, rn = _gls_bucket_impl(
                ns, vs, esup2d, esup_cnt, fsup2d, fsup_cnt,
                point_pack, cell_pack, face_pack, neumann_flag, **kw)
        else:
            w, wn, rn = _gls_bucket_scan(
                ns, vs, esup2d, esup_cnt, fsup2d, fsup_cnt,
                point_pack, cell_pack, face_pack, neumann_flag, **kw)
        parts.append((w, wn))
        rns.append(rn)
    return _consolidate_device(tuple(parts), pos_flat, tuple(rns),
                               tol=tol, ncols_out=ncols_out,
                               n_target=n_target)


@partial(jax.jit, static_argnames=("ncols_out", "delivery_f32"))
def _concat_group(parts, *, ncols_out, delivery_f32):
    """Host-delivery path: pad + concatenate one fetch group's bucket
    rows in a single program (fetch of group k overlaps the still-
    running bucket kernels of groups > k)."""
    rows = [_pad_rows_j(w, wn, ncols_out) for w, wn in parts]
    cat = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)
    return cat.astype(jnp.float32) if delivery_f32 else cat


from .device_grid import group_plan as _group_plan  # noqa: E402
from .device_grid import fetch_groups_overlapped as _fetch_overlapped  # noqa: E402

# Shape signatures whose consolidation executables were already pulled
# through the remote helper this process (see device_grid._preloaded_sigs)
_preloaded_sigs = set()


def precompute_face_data(grid, perm, diff_mag):
    """Per-face flux vectors K N for both sides + eta = max diff_mag of
    the pair — pure face data the reference recomputes per node
    (gls.pyx:301-321: dgemv("T") on a ROW-major 3x3 buffer, which BLAS
    reads column-major as K^T and transposes back, i.e. K @ N).
    nLbg (Neumann rows) uses the owner (first) cell (gls.pyx:396-397) —
    numerically equal to nL1g, computed separately to keep the owner
    derivation explicit."""
    perm = np.reshape(np.asarray(perm), (grid.n_elems, 3, 3))
    diff_mag = np.asarray(diff_mag).reshape(-1)[:grid.n_elems]
    fptr = grid.esuf_ptr
    first = grid.esuf[fptr[:-1]]
    has2 = np.diff(fptr) >= 2
    second = np.where(has2, grid.esuf[np.minimum(
        fptr[:-1] + 1, len(grid.esuf) - 1)], first)
    Nrm = grid.normal_faces
    nL1g = np.einsum("fij,fj->fi", perm[first], Nrm)
    nL2g = np.einsum("fij,fj->fi", perm[second], Nrm)
    etag = np.maximum(diff_mag[first], diff_mag[second])
    nLbg = np.einsum("fij,fj->fi", perm[first], Nrm)
    return nL1g, nL2g, etag, nLbg


def build_flux_block(grid, perm, diff_mag, neumann_val):
    """The 16 float32 per-variable flux columns of the packed face row,
    built host-side into ONE preallocated buffer (concatenating
    per-piece temporaries peaked ~1 GB higher at 2M-cell scale).

    Columns: [0:3]/[3:6] K@N side-1 hi/lo, [6:9]/[9:12] K@N side-2
    hi/lo, [12]/[13] eta hi/lo, [14]/[15] per-face Neumann mean hi/lo
    (f64 mean over the face's points, same semantics as the oracle /
    gls.pyx:374-416 — packing it per FACE removes the per-face-POINT
    scalar gathers from the Neumann-bucket kernels).
    """
    nL1g, nL2g, etag, _ = precompute_face_data(grid, perm, diff_mag)
    flux = np.empty((grid.n_faces, 16), np.float32)

    def sp_into(a, lo_col):
        a = np.asarray(a, np.float64).reshape(grid.n_faces, -1)
        h = a.astype(np.float32)
        k = a.shape[1]
        flux[:, lo_col:lo_col + k] = h
        flux[:, lo_col + k:lo_col + 2 * k] = (
            (a - h.astype(np.float64)).astype(np.float32))

    sp_into(nL1g, 0)
    sp_into(nL2g, 6)
    sp_into(etag, 12)
    nvraw = np.asarray(neumann_val, np.float64)
    ipofa = grid.inpofa
    ipv = ipofa >= 0
    nsum = np.where(ipv, nvraw[np.where(ipv, ipofa, 0)], 0.0)
    nmean_face = nsum.sum(axis=1) / np.maximum(ipv.sum(axis=1), 1)
    sp_into(nmean_face, 14)
    return flux


def build_face_pack(dgrid, perm, diff_mag, neumann_val, put_geo=None):
    """THE single construction site for the 30-column packed face row
    consumed by the GLS kernels (used by GLSInterpolation.prepare,
    parallel/sharding.sharded_gls and __graft_entry__.entry; layout
    pinned by tests/test_methods.py::test_face_pack_layout).

    f32 columns: [0:2] esuf cell pair (int32 bitcast — bit patterns
    survive gather/slice), [2:5]/[5:8] face normal hi/lo,
    [8:11]/[11:14] face center hi/lo, [14:30] the flux block of
    ``build_flux_block``.  30 columns stays under the 32-column
    (128-byte) cap of the TPU gather fast path; the boundary flag and
    Neumann-row vectors are derived in-kernel.

    ``put_geo`` overrides the placement of the flux block (defaults to
    ``dgrid.put_geo`` — replicated, or dim-0 partitioned with padding in
    shard_geometry mode, matching the resident geometry pairs).
    """
    put = dgrid.put_geo if put_geo is None else put_geo
    flux = build_flux_block(dgrid.grid, perm, diff_mag, neumann_val)
    ip_f = jax.lax.bitcast_convert_type(dgrid.face_ipack, jnp.float32)
    return jnp.concatenate(
        [ip_f[:, 0:2], dgrid.nrm_h, dgrid.nrm_l, dgrid.fcc_h,
         dgrid.fcc_l, put(flux)], axis=1)


# ---------------------------------------------------------------------------
# Public driver
# ---------------------------------------------------------------------------
class GLSInterpolation:
    """Driver matching the reference's prepare() contract
    (gls.pyx:38-72)."""

    def __init__(self, logging=False):
        self.logging = logging
        # "auto" resolves to "cholqr" everywhere: shifted CholeskyQR2
        # (f32, MXU) + df32 structured refinement — the same algorithm on
        # TPU (Pallas kernels) and CPU (LAPACK-backed fallbacks), so the
        # tested path IS the shipped path.  "pallas" (df32 Householder
        # QR) and "refined" (f64 normal-equation refinement) remain
        # selectable for cross-checks.
        self.solver = "auto"
        self.n_refine = 2
        # CholQR rounds in the fused preconditioner: 2 (default) keeps
        # the residual contraction cond-independent.  1 drops Q/Gram2/
        # chol2 (~45% of the kernel) but contracts at ~eps32*cond(A)^2:
        # MEASURED on the 1M tet bench to cause an exact-fallback storm
        # (209 s vs 2 s per run) — real tetra stencils reach cond(A)
        # ~1e3-3e3, where one round stalls.  Keep 2 unless the mesh is
        # known to be near-orthogonal.
        self.precond_rounds = 2
        self.exact = False
        self.neumann_compat = True
        # Nodes whose estimated relative solve error (last refinement
        # correction / solution norm) exceeds this are re-solved on the
        # exact float64 Householder path (rare: needs cond(A) > ~4e3
        # after equilibration).
        self.fallback_tol = 1e-11
        # Working-set budget per kernel launch (B*m*n matrix elements).
        # The fused cholqr path holds only f32 tiles (A_t ~ 4 bytes/elem),
        # so 16k-node chunks fit easily and amortize the per-op dispatch
        # overheads of the XLA prologue; the float64 exact path keeps the
        # old tighter budget (emulation inflates bytes/element heavily).
        #
        # DO NOT raise this past 4.6e8: it caps the (E=24,F=36) tetra
        # class at B=16384, and the (24,36,B=32768) fused kernel
        # MISCOMPILES on this toolchain — every node of every full 32k
        # chunk comes back with clamped pivots (dmax sick flag, rnorm
        # pinned to 1.0) and garbage weights, while the same nodes at
        # B<=16384 are bit-healthy, and the SMALLER (8,12,32768) hexa
        # tiles are also healthy (tools/chunk32_debug.py reproduces in
        # ~3 min from warm caches).  Raising the budget to 1.2e9 was
        # tried (launch-latency motivation: ~30 ms/dispatch x 20
        # interior dispatches at 16k vs 10 at 32k, see
        # tools/bucket_attrib_probe.py) and reverted; the safe route to
        # fewer dispatches is fusing several 16k chunk bodies into one
        # jitted program (lax.scan over stacked chunks), not bigger
        # Pallas grids.
        self.chunk_elems = int(4.6e8)
        self.chunk_elems_exact = int(1.45e8)
        # nodes per chunk before the element budget caps it (exposed as
        # an attribute so tests/probes can shrink it to exercise the
        # scan-stacked multi-chunk path on tiny meshes)
        self.chunk_nodes = 32768
        # device-side caches (per grid+variable): face flux vectors and
        # point flags — re-uploading them every prepare() costs seconds
        # through this environment's ~50 MB/s host<->device relay.
        # Keyed by the Interpolator's monotonic _data_version stamp
        # (set on us as _data_token before each dispatch): id()-based
        # keys are unsafe because CPython reuses object addresses after
        # GC, which could silently serve stale flux vectors.
        self._data_token = None
        self._face_cache_key = None
        self._face_cache = None
        # f32 host delivery (documented non-parity knob, see
        # Interpolator.delivery_f32)
        self.delivery_f32 = False
        # executable inventory of the last prepared plan (bench.py
        # reports it: warm start is linear in this count)
        self.last_program_count = None

    def prepare(self, dgrid, cells_data, points_data, faces_data,
                variable_to_index, variable, target_points,
                weights, neumann_ws, device_out=False):
        # NINPOL_TPU_PHASES=1: per-phase wall timing to stderr (for
        # attributing end-to-end overhead on hardware; phases overlap
        # device compute, so they sum to dispatch-side wall, not device
        # time)
        import os as _os
        import time as _time
        _phase_on = _os.environ.get("NINPOL_TPU_PHASES") == "1"
        _tp0 = _time.perf_counter()
        _ph = []

        def _mark(name):
            if _phase_on:
                _ph.append((name, _time.perf_counter() - _tp0))

        grid = dgrid.grid
        perm_idx = variable_to_index["cells"]["permeability"]
        diff_idx = variable_to_index["cells"]["diff_mag"]
        nf_idx = variable_to_index["points"]["neumann_flag_" + variable]
        nv_idx = variable_to_index["points"]["neumann_" + variable]

        neumann_flag = points_data[nf_idx].astype(np.int32)

        target_points = np.asarray(target_points)
        # active: skip Dirichlet boundary nodes (gls.pyx:165-166)
        active = ~(grid.boundary_points[target_points].astype(bool)
                   & (neumann_flag[target_points] == 0))

        # Per-face flux data + flags: computed and uploaded ONCE per
        # (grid, variable) — the host<->device link of this environment
        # runs at ~50 MB/s, so re-uploading ~100 MB of face vectors every
        # call would dominate the whole interpolation.
        if self._data_token is not None:
            ckey = ("v", self._data_token, variable)
        else:   # direct prepare() calls outside an Interpolator
            ckey = (id(grid), id(cells_data), id(points_data), variable)
        if self._face_cache_key != ckey:
            perm = np.reshape(cells_data[perm_idx], (grid.n_elems, 3, 3))
            diff_mag = cells_data[diff_idx]
            # ONE packed face row per face (kernel gathers it once;
            # geometry columns come from the device-resident grid
            # pairs, flux columns are uploaded here; in shard_geometry
            # mode put_geo gives the flux block the grid arrays' dim-0
            # partitioning so the concat operands agree)
            face_pack = build_face_pack(
                dgrid, perm, diff_mag, points_data[nv_idx])
            self._face_cache = (face_pack, dgrid.put_geo(neumann_flag))
            self._face_cache_key = ckey
        face_dev = self._face_cache
        _mark("face_cache")

        solver = self.solver
        if solver == "auto":
            solver = "cholqr"
        fused_ok = (solver == "cholqr"
                    and (jax.default_backend() == "tpu" or _FORCE_FUSED))

        mesh = getattr(dgrid, "mesh", None)
        shard_geo = getattr(dgrid, "shard_geometry", False)

        from .device_grid import bucket_dev

        def run_bucket(bucket, exact):
            if mesh is None:
                nv = bucket_dev(bucket)
            elif shard_geo:
                from jax.sharding import NamedSharding, PartitionSpec
                nsh = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
                nv = (jax.device_put(jnp.asarray(bucket["nodes"]), nsh),
                      jax.device_put(jnp.asarray(bucket["valid"]), nsh))
            else:
                nv = (bucket["nodes"], bucket["valid"])
            args = (
                *nv,
                dgrid.esup2d, dgrid.esup_cnt, dgrid.fsup2d, dgrid.fsup_cnt,
                dgrid.point_pack, dgrid.cell_pack,
                *face_dev)
            statics = dict(
                E=bucket["E"], F=bucket["F"], n_refine=self.n_refine,
                exact=exact, neumann_compat=self.neumann_compat,
                with_neumann=bucket.get("with_neumann", True),
                solver=solver,
                # geometry-sharded mode runs the XLA solver path under
                # GSPMD auto-partitioning (the sharded inputs make XLA
                # insert the stencil-gather all-gathers); the fused
                # Pallas kernel requires replicated geometry
                fused=fused_ok and not exact and not shard_geo,
                rounds=self.precond_rounds)
            if mesh is None:
                return _gls_bucket_kernel(*args, **statics)
            if shard_geo:
                return _gls_bucket_kernel(*args, **statics)
            return _gls_bucket_sharded(
                mesh, tuple(sorted(statics.items())))(*args)

        def gather_tiles(unit):
            """Pre-gathered + tiled kernel inputs for one unit, cached
            on the unit dict (which persists in the DeviceGrid
            plan/scan-unit caches) keyed by the face-cache key — new
            variable data re-gathers, repeat prepares reuse."""
            kind, p = unit
            cached = p.get("_tiles")
            if cached is not None and cached[0] == tkey:
                return cached[1]
            if kind == "scan":
                tiles = _gls_gather_scan(
                    p["nodes_sd"], p["valid_sd"],
                    dgrid.esup2d, dgrid.esup_cnt, dgrid.fsup2d,
                    dgrid.fsup_cnt, dgrid.point_pack, dgrid.cell_pack,
                    *face_dev, E=p["E"], F=p["F"],
                    wneu=p["with_neumann"])
            else:
                tiles = _gls_gather_j(
                    *bucket_dev(p),
                    dgrid.esup2d, dgrid.esup_cnt, dgrid.fsup2d,
                    dgrid.fsup_cnt, dgrid.point_pack, dgrid.cell_pack,
                    *face_dev, E=p["E"], F=p["F"],
                    wneu=p["with_neumann"])
            p["_tiles"] = (tkey, tiles)
            return tiles

        def run_unit(unit, exact):
            kind, payload = unit
            if pregather and not exact:
                kw = dict(n_refine=self.n_refine,
                          neumann_compat=self.neumann_compat,
                          with_neumann=payload["with_neumann"],
                          rounds=self.precond_rounds)
                tiles = gather_tiles(unit)
                if kind == "scan":
                    return _gls_solve_tiles_scan(tiles, **kw)
                return _gls_solve_tiles_j(tiles, **kw)
            if kind == "single":
                return run_bucket(payload, exact)
            mb = payload
            return _gls_bucket_scan(
                mb["nodes_sd"], mb["valid_sd"],
                dgrid.esup2d, dgrid.esup_cnt, dgrid.fsup2d,
                dgrid.fsup_cnt, dgrid.point_pack, dgrid.cell_pack,
                *face_dev,
                E=mb["E"], F=mb["F"], n_refine=self.n_refine,
                exact=exact, neumann_compat=self.neumann_compat,
                with_neumann=mb["with_neumann"], solver=solver,
                fused=fused_ok and not exact,
                rounds=self.precond_rounds)

        def unit_sig(unit):
            kind, p = unit
            S = p.get("S", 1)
            return (kind, p["E"], p["F"], S, len(p["pos"]) // S,
                    p["with_neumann"])

        # Interior nodes skip the Neumann row block entirely (a static
        # kernel variant with ~45% fewer matrix rows), so bucket the
        # Neumann-boundary nodes separately.
        is_neu_t = neumann_flag[target_points] != 0
        chunk_elems = (self.chunk_elems_exact if self.exact
                       else self.chunk_elems)
        # fused-path chunks: 32k nodes/dispatch (VMEM use is per 128-node
        # tile, so larger chunks only add HBM-resident tiles; fewer
        # dispatches amortize the ~70 ms round-trip latencies)
        chunk_size = 8192 if self.exact else self.chunk_nodes
        balign = 256 if mesh is None else max(256, 128 * mesh.devices.size)
        all_buckets = []
        for mask, wneu in ((active & ~is_neu_t, False),
                           (active & is_neu_t, True)):
            for bucket in dgrid.buckets(target_points, mask,
                                        chunk_size=chunk_size,
                                        chunk_elems=chunk_elems,
                                        batch_align=balign):
                bucket["with_neumann"] = wneu
                all_buckets.append(bucket)
        # scan chunk-stacking: identical-shape chunks fuse into one
        # program each (exact mode keeps singles — its huge f64
        # Householder programs are rare and compile-heavy already).
        # NINPOL_TPU_NO_SCAN=1 falls back to per-chunk dispatch (kill
        # switch for hardware-lowering regressions in scan-over-Pallas).
        if (mesh is None and not self.exact
                and _os.environ.get("NINPOL_TPU_NO_SCAN") != "1"):
            units = _build_scan_units(all_buckets)
        else:
            units = [("single", b) for b in all_buckets]

        # Pre-gather tile cache: the fused path's stencil gathers cost
        # MORE than the solve kernel once the packed tables are
        # HBM-large (~32 ms vs 28.6 ms per 16k chunk at 1.9M tets —
        # tools/gather_probe.py: cost tracks physical table size and no
        # in-solve gather form fixes it), and their output is a pure
        # function of (grid, variable, plan) — the _face_cache contract.
        # So the gathers run as their OWN programs, once per face-cache
        # key, cached on the unit dicts via gather_tiles() above; the
        # timed solve consumes cached tiles.  Cost: ~33E+124F+40 bytes
        # of HBM per padded node (~5.3 KB at E=24,F=36 → ~1.8 GB at
        # 1.9M tets) — NINPOL_TPU_PREGATHER_GB (default 6) caps the
        # footprint and falls back to in-program gathers when over;
        # NINPOL_TPU_NO_PREGATHER=1 is the kill switch.
        pregather = (fused_ok and not self.exact and mesh is None
                     and _os.environ.get("NINPOL_TPU_NO_PREGATHER")
                     != "1")
        if pregather:
            # bytes/node: ppk 6 + cpk 6*Ep + fpk 28*Fp + pair 2*Fp +
            # ks/cv 2*E + fv F + neu/vld 2, all 4-byte (tile_kc pads
            # plane strides to sublane multiples Ep/Fp)
            est = sum(len(p["pos"])
                      * 4 * (8 + 6 * (-(-p["E"] // 8) * 8)
                             + 30 * (-(-p["F"] // 8) * 8)
                             + 2 * p["E"] + p["F"])
                      for _, p in units)
            budget = float(_os.environ.get(
                "NINPOL_TPU_PREGATHER_GB", "6")) * 1e9
            pregather = est <= budget
        tkey = self._face_cache_key
        if pregather:
            # Gather ALL units' missing tiles in ONE merged program
            # (each per-unit gather shape costs ~10 s of executable
            # load through the remote helper; see _gls_gather_plan).
            # TPU only by default: per-unit gather programs ride the
            # shape ladder across mesh scales, which keeps the CPU
            # suite's compile count bounded.
            merged = (_os.environ.get("NINPOL_TPU_PER_UNIT_GATHER")
                      != "1"
                      and (jax.default_backend() == "tpu"
                           or _os.environ.get(
                               "NINPOL_TPU_MERGED_GATHER") == "1"))
            missing = [u for u in units
                       if (u[1].get("_tiles") is None
                           or u[1]["_tiles"][0] != tkey)]
            if merged and len(missing) > 1:
                from .device_grid import bucket_dev as _bdev
                nl, vl, psig = [], [], []
                for kind, p in missing:
                    if kind == "scan":
                        nl.append(p["nodes_sd"])
                        vl.append(p["valid_sd"])
                        psig.append((p["E"], p["F"], p["S"], p["with_neumann"]))
                    else:
                        nd, vd = _bdev(p)
                        nl.append(nd)
                        vl.append(vd)
                        psig.append((p["E"], p["F"], 1, p["with_neumann"]))
                tiles_all = _gls_gather_plan(
                    tuple(nl), tuple(vl), dgrid.esup2d, dgrid.esup_cnt,
                    dgrid.fsup2d, dgrid.fsup_cnt, dgrid.point_pack,
                    dgrid.cell_pack, *face_dev, plan_sig=tuple(psig))
                for (_k, p), t in zip(missing, tiles_all):
                    p["_tiles"] = (tkey, t)
        # Executable inventory for this plan (each distinct program
        # costs ~10 s of load through the remote helper even fully
        # cached — bench.py reports this so program-count regressions
        # are visible): solve programs (one per unit sig) + gather
        # programs (1 merged, or one per (E,F,S,B) sig) + the
        # consolidation program.
        _usigs = {unit_sig(u) for u in units}
        if not pregather:
            _gp = 0
        elif (_os.environ.get("NINPOL_TPU_PER_UNIT_GATHER") != "1"
              and (jax.default_backend() == "tpu"
                   or _os.environ.get("NINPOL_TPU_MERGED_GATHER")
                   == "1")):
            _gp = 1
        else:
            _gp = len({s[1:5] for s in _usigs})
        self.last_program_count = len(_usigs) + _gp + 1
        _mark("bucket_plan")

        # Dispatch all chunks asynchronously (JAX queues them), then
        # consolidate every bucket's output in ONE jitted program (plus
        # one per host-delivery fetch group): the host<->device relay
        # here has ~70 ms latency PER TRANSFER at ~50 MB/s, and each
        # distinct eager op is a separate executable costing ~10 s to
        # load through the remote helper even fully cached.
        n_target = len(target_points)
        ncols_out = weights.shape[1]

        def scatter_bucket(bucket, w, wn, wdev):
            # invalid (padding) rows carry pos == -1; route them out of
            # bounds and drop (negative indices would WRAP in jnp)
            pos = jnp.asarray(np.where(bucket["pos"] >= 0,
                                       bucket["pos"], n_target))
            return wdev.at[pos].set(_pad_rows_j(w, wn, ncols_out),
                                    mode="drop")

        # Pull each DISTINCT compiled program through the remote helper
        # from a thread pool before the sequential launch: even fully
        # cached, an executable load blocks the dispatching thread for
        # ~10 s per program through this environment's helper, and the
        # loads overlap across threads (a cold process touches 4-10
        # programs -> a minute or more of warm-start saved).  The solve
        # programs are preloaded by RUNNING the first bucket of each
        # class (results kept, no work dispatched twice); the output
        # consolidation programs are preloaded with same-shape
        # device-resident zero inputs (their junk results are dropped,
        # and jnp.zeros allocates on device — no host transfer), once
        # per shape signature per process (the dummy executions cost a
        # dropped full-size consolidation run plus transient HBM).
        tol_f = float(self.fallback_tol
                      if self.fallback_tol is not None else 0.0)
        group_delivery = _os.environ.get(
            "NINPOL_TPU_GROUP_DELIVERY") == "1"
        # device_out whole-plan-as-ONE-program path (solve scans +
        # consolidation fused).  MEASURED SLOWER on hardware and OFF by
        # default (opt-in NINPOL_TPU_MEGA=1): 1.275 s vs 1.161 s
        # device-complete at 1.9M tets — after scan stacking, the
        # remaining 4-5 dispatch boundaries cost little (the enqueues
        # pipeline), so fusing only added XLA copies, while the fused
        # program also loses the host path's fetch/compute overlap.
        # Kept because it is the right shape for environments whose
        # per-dispatch gaps ARE large (the kill-switch polarity can
        # flip if a future helper regresses).
        use_mega = (mesh is None and not self.exact and device_out
                    and _os.environ.get("NINPOL_TPU_NO_SCAN") != "1"
                    and _os.environ.get("NINPOL_TPU_MEGA") == "1")
        if use_mega:
            from .device_grid import bucket_dev as _bdev
            plan_sig, nl, vl = [], [], []
            for kind, p in units:
                if kind == "scan":
                    plan_sig.append((p["E"], p["F"], p["S"],
                                     len(p["pos"]) // p["S"],
                                     p["with_neumann"]))
                    nl.append(p["nodes_sd"])
                    vl.append(p["valid_sd"])
                else:
                    nd, vd = _bdev(p)
                    plan_sig.append((p["E"], p["F"], 1, len(p["pos"]),
                                     p["with_neumann"]))
                    nl.append(nd)
                    vl.append(vd)
            from .device_grid import plan_pos_flat as _ppf
            pos_flat = (_ppf([p for _, p in units], n_target) if units
                        else jnp.asarray(np.zeros(0, np.int64)))
            wdev, rndev, n_bad_dev = _run_plan_device(
                tuple(nl), tuple(vl),
                dgrid.esup2d, dgrid.esup_cnt, dgrid.fsup2d,
                dgrid.fsup_cnt, dgrid.point_pack, dgrid.cell_pack,
                *face_dev, pos_flat,
                plan_sig=tuple(plan_sig),
                kern_sig=(self.n_refine, self.neumann_compat, solver,
                          fused_ok, self.precond_rounds),
                tol=tol_f, ncols_out=ncols_out, n_target=n_target)
            _mark("mega_dispatch")
        preloaded = {}
        payloads = [u[1] for u in units]
        if mesh is None and units and not use_mega:
            first_of = {}
            for u in units:
                first_of.setdefault(unit_sig(u), u)
            sig = ("gls",
                   tuple((p["E"], len(p["pos"])) for p in payloads),
                   n_target, ncols_out, device_out, tol_f,
                   bool(self.delivery_f32), group_delivery)
            f64_ = jnp.float64
            zeros = jnp.zeros

            def dummy_parts(ps):
                return tuple((zeros((len(p["pos"]), p["E"]), f64_),
                              zeros((len(p["pos"]),), f64_)) for p in ps)

            def preload_consolidate():
                rns_d = tuple(zeros((len(p["pos"]),), f64_)
                              for p in payloads)
                pos_d = zeros((sum(len(p["pos"]) for p in payloads),),
                              jnp.int64)
                if device_out or not group_delivery:
                    _consolidate_device(dummy_parts(payloads), pos_d,
                                        rns_d, tol=tol_f,
                                        ncols_out=ncols_out,
                                        n_target=n_target)
                else:
                    _consolidate_rnorm(rns_d, pos_d, tol=tol_f,
                                       n_target=n_target)

            def preload_concat(grp):
                _concat_group(dummy_parts(grp), ncols_out=ncols_out,
                              delivery_f32=bool(self.delivery_f32))

            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(min(8, len(first_of) + 5)) as ex:
                futs = {ex.submit(run_unit, u, self.exact): id(u[1])
                        for u in first_of.values()}
                cjobs = []
                if sig not in _preloaded_sigs:
                    _preloaded_sigs.add(sig)
                    cjobs = [ex.submit(preload_consolidate)]
                    if not device_out and group_delivery:
                        cjobs += [ex.submit(preload_concat, grp)
                                  for grp in _group_plan(payloads)]
                for f in futs:
                    preloaded[futs[f]] = f.result()
                for c in cjobs:
                    c.result()
        _mark("preload")

        launched = []
        if not use_mega:
            for unit in units:
                res = preloaded.pop(id(unit[1]), None)
                w, wn, rnorm = (res if res is not None
                                else run_unit(unit, self.exact))
                launched.append((unit[1], w, wn, rnorm))
            _mark("dispatch")

            # all padding positions route out of bounds and drop
            # (negative indices would WRAP in jnp); ONE consolidated,
            # plan-cached device array for every bucket's positions
            # (the ~2.6 MB re-upload sat inside the timed path)
            from .device_grid import plan_pos_flat as _ppf
            pos_flat = (_ppf([b for b, _, _, _ in launched], n_target)
                        if launched else jnp.asarray(np.zeros(0, np.int64)))
            rns = tuple(r for _, _, _, r in launched)
        if use_mega:
            pass                      # wdev/rndev/n_bad_dev already set
        elif device_out or not group_delivery:
            wdev, rndev, n_bad_dev = _consolidate_device(
                tuple((w, wn) for _, w, wn, _ in launched),
                pos_flat, rns, tol=tol_f, ncols_out=ncols_out,
                n_target=n_target)
            _mark("consolidate")
            if not device_out:
                # Host delivery rides the SAME consolidation program as
                # device_out (one fewer distinct executable — each costs
                # ~10 s of load through this environment's remote
                # helper) and fetches in ONE transfer: the relay
                # serializes transfers anyway, and the largest concat
                # group of the old path carried most of the compute, so
                # the fetch/compute overlap it gave up is < the 0.58 s
                # kernel time.  Values are bit-identical: the same rows
                # pass through the same at[pos].set scatter the
                # device_out path is pinned to.
                src = (wdev.astype(jnp.float32) if self.delivery_f32
                       else wdev)
                host = np.asarray(src)
                rows = np.nonzero(active)[0]
                weights[rows, :] = host[rows, :ncols_out]
                neumann_ws[rows] = host[rows, ncols_out]
                _mark("host_write")
        else:
            rndev, n_bad_dev = _consolidate_rnorm(
                rns, pos_flat, tol=tol_f, n_target=n_target)
            # Legacy grouped host delivery (NINPOL_TPU_GROUP_DELIVERY=1):
            # chunk outputs in a few compact device concats fetched
            # SEQUENTIALLY — a fetch of an early group overlaps the
            # still-running compute of later groups.  Costs 1 + n_groups
            # extra executables vs the consolidated path above; kept as
            # a measured A/B knob for relay-latency regressions.
            groups = _group_plan(launched)
            cats = [_concat_group(
                tuple((w, wn) for _, w, wn, _ in grp),
                ncols_out=ncols_out,
                delivery_f32=bool(self.delivery_f32)) for grp in groups]

            def write_group(grp, host):
                lo = 0
                for bucket, w, _, _ in grp:
                    nb = w.shape[0]
                    sel = bucket["valid"]
                    pos = bucket["pos"][sel]
                    blk = host[lo:lo + nb][sel]
                    weights[pos, :] = blk[:, :ncols_out]
                    neumann_ws[pos] = blk[:, ncols_out]
                    lo += nb

            _fetch_overlapped(cats, groups, write_group)
            _mark("host_write")

        if not self.exact and self.fallback_tol is not None:
            # a 1-element device-side count decides whether the full
            # per-node rnorm vector is worth fetching at all (padding /
            # inactive rows carry rnorm == 0, so only genuinely
            # unconverged nodes count); NaN-safe: anything not provably
            # converged falls back
            n_bad = int(np.asarray(n_bad_dev))
            _mark(f"n_bad_sync(n_bad={n_bad})")
            bad_all = np.zeros(n_target, dtype=bool)
            if n_bad:
                rn_host = np.asarray(rndev)
                bad_all = active & ~(rn_host <= self.fallback_tol)
            if bad_all.any():
                # Re-solve ill-conditioned stragglers exactly (float64
                # Householder); typically a handful.  Batch shapes are
                # canonical powers of two capped at 2048 so the (huge)
                # exact-path executables come from a small fixed set
                # regardless of how many nodes fell back this run.
                fbs = []
                for bucket in all_buckets:
                    sel = bucket["valid"]
                    bpos = bucket["pos"]
                    bad = sel & (bpos >= 0) & bad_all[np.maximum(bpos, 0)]
                    if not bad.any():
                        continue
                    bad_nodes = bucket["nodes"][bad]
                    bad_pos = bucket["pos"][bad]
                    fb_cap = max(2048, balign)
                    for lo in range(0, len(bad_nodes), fb_cap):
                        nb = min(fb_cap, len(bad_nodes) - lo)
                        Bpad = balign
                        while Bpad < nb:
                            Bpad *= 2
                        fb = {
                            "nodes": np.zeros(Bpad, dtype=np.int32),
                            "valid": np.zeros(Bpad, dtype=bool),
                            "pos": np.full(Bpad, -1, dtype=np.int64),
                            "E": bucket["E"], "F": bucket["F"],
                            "with_neumann": bucket.get("with_neumann",
                                                       True),
                        }
                        fb["nodes"][:nb] = bad_nodes[lo:lo + nb]
                        fb["valid"][:nb] = True
                        fb["pos"][:nb] = bad_pos[lo:lo + nb]
                        fbs.append(fb)
                # preload distinct exact executables concurrently, then
                # dispatch all fallback chunks and deliver in grouped
                # fetches (per-chunk fetches cost ~70 ms latency each)
                pre = {}
                if mesh is None and len(fbs) > 1:
                    fb_first = {}
                    for b in fbs:
                        k = (b["E"], b["F"], len(b["pos"]),
                             b["with_neumann"])
                        fb_first.setdefault(k, b)
                    if len(fb_first) > 1:
                        from concurrent.futures import ThreadPoolExecutor
                        with ThreadPoolExecutor(
                                min(8, len(fb_first))) as ex:
                            futs = {ex.submit(run_bucket, b, True): id(b)
                                    for b in fb_first.values()}
                            for f in futs:
                                pre[futs[f]] = f.result()
                fb_launched = []
                for fb in fbs:
                    res = pre.pop(id(fb), None)
                    w2, wn2, _ = (res if res is not None
                                  else run_bucket(fb, True))
                    fb_launched.append((fb, w2, wn2))
                if device_out:
                    for fb, w2, wn2 in fb_launched:
                        wdev = scatter_bucket(fb, w2, wn2, wdev)
                else:
                    for grp in _group_plan(fb_launched):
                        host = np.asarray(_concat_group(
                            tuple((w2, wn2) for _, w2, wn2 in grp),
                            ncols_out=ncols_out, delivery_f32=False))
                        lo = 0
                        for fb, w2, _ in grp:
                            nb = w2.shape[0]
                            sel = fb["valid"]
                            fpos = fb["pos"][sel]
                            blk = host[lo:lo + nb][sel]
                            weights[fpos, :] = blk[:, :ncols_out]
                            neumann_ws[fpos] = blk[:, ncols_out]
                            lo += nb
                _mark("exact_fallback")

        if _phase_on:
            import sys as _sys
            print("# gls phases: " + " ".join(
                f"{n}={t:.3f}s" for n, t in _ph), file=_sys.stderr)
        if device_out:
            # device-resident result: (n_target, ncols+1) float64 of
            # [weights | neumann_w] — for on-device consumers (e.g. an
            # MPFA assembly) and for benchmarking compute separately
            # from the host-delivery cost of this environment's relay.
            return wdev
        return weights, neumann_ws
