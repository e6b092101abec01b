"""MXU feasibility probe for the fused GLS solve stages.

The fused kernel (ops/pallas_chol.py) keeps everything in the "VPU
layout" (nodes on the 128-lane axis) and runs Gram / Q formation as
full-width vector ops at ~0.7-1.4 f32 Tflop/s — near single-VPU peak.
The untried lever is the MXU: transpose the tile inside VMEM so each
node is a 2D (m, n) matrix and issue per-node `lax.dot_general`s
(precision HIGHEST — the only f32-true mode Mosaic legalizes here).

This probe measures, at the production shape (E=24, F=40 ->
m=144, n_pad=80), per node:
  1. the in-VMEM transpose (m, n_pad, NT) -> (NT, m, n_pad)
  2. batched per-node Gram via dot_general (output in MXU layout)
  3. the back-transpose (NT, n, n) -> (n, n, NT)
  4. the full round trip transpose + gram + back-transpose
  5. (for reference) the VPU slabbed Gram from ops/pallas_chol

If (4) lands well under the VPU Gram's ~667 ns/node, the fused kernel's
three heavy stages (Gram1, Q=A Li^T, Gram2 ~ 2.15 us/node of 2.6) are
worth moving to the MXU.

Usage: python tools/mxu_probe.py [G] (default 64 tiles = 8k nodes)
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import ninpol_tpu  # noqa: F401
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ninpol_tpu.ops.pallas_chol import NT, _VMEM_LIMIT

    # Superseded VPU slab forms, kept here as the measurement baseline
    # (removed from pallas_chol once the MXU forms won).
    def _iota_eq(shape, axis, kk):
        return (jax.lax.broadcasted_iota(jnp.int32, shape, axis)
                == kk).astype(jnp.float32)

    def _gram_cols_into(a, gscr, n_pad, diag_vec):
        for j0 in range(0, n_pad, 8):
            sl = a[:, j0:, :]
            for c in range(8):
                j = j0 + c
                col = jnp.sum(sl * sl[:, c:c + 1, :], axis=0)
                first = _iota_eq((n_pad - j0, NT), 0, c)
                gscr[j, j0:, :] = col + first * diag_vec[j][None, :]

    def _form_q(a, li1, q_scr, m, n_pad):
        for i0 in range(0, n_pad, 8):
            acc = jnp.zeros((m, 8, NT), jnp.float32)
            for j in range(min(i0 + 8, n_pad)):
                acc = acc + (a[:, j:j + 1, :]
                             * li1[i0:i0 + 8, j, :][None, :, :])
            q_scr[:, i0:i0 + 8, :] = acc

    G = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    E, F = 24, 40
    n = 3 * E + 1
    n_pad = -(-n // 8) * 8
    m = E + 3 * F
    f32 = jnp.float32
    B = G * NT
    HI = jax.lax.Precision.HIGHEST

    rng = np.random.default_rng(0)
    A = jnp.asarray(rng.standard_normal((G, m, n_pad, NT)) * 0.1, f32)
    At = jnp.asarray(rng.standard_normal((G, NT, m, n_pad)) * 0.1, f32)
    Gt = jnp.asarray(rng.standard_normal((G, NT, n_pad, n_pad)) * 0.1, f32)

    sp = lambda *dims: pl.BlockSpec(
        (1,) + dims, lambda i: (i,) + (i * 0,) * len(dims),
        memory_space=pltpu.VMEM)
    cp = pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                              vmem_limit_bytes=_VMEM_LIMIT)

    k = int(os.environ.get("NINPOL_PROBE_K", "100"))

    def timeit(name, fn, sync_slice):
        try:
            out = fn()
            np.asarray(sync_slice(out))
        except Exception as e:  # legalization failures are data too
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            return None
        t0 = time.perf_counter()
        for _ in range(k):
            out = fn()
        np.asarray(sync_slice(out))
        dt = (time.perf_counter() - t0) / k
        print(f"{name}: {dt*1e3:.2f} ms for {B} nodes = "
              f"{dt/B*1e9:.0f} ns/node", flush=True)
        return dt

    # ---- 1. transpose VPU -> MXU layout ------------------------------------
    def tr_kernel(a_ref, o_ref):
        o_ref[0] = jnp.transpose(a_ref[0], (2, 0, 1))

    tr = jax.jit(lambda a: pl.pallas_call(
        tr_kernel, grid=(G,), in_specs=[sp(m, n_pad, NT)],
        out_specs=sp(NT, m, n_pad),
        out_shape=jax.ShapeDtypeStruct((G, NT, m, n_pad), f32),
        compiler_params=cp)(a))
    timeit("transpose (m,n,NT)->(NT,m,n)", lambda: tr(A),
           lambda o: o[:1, :1, :1, :1])

    # ---- 2. batched per-node Gram on the MXU --------------------------------
    def gram_mxu_kernel(at_ref, o_ref):
        at = at_ref[0]                                  # (NT, m, n_pad)
        o_ref[0] = jax.lax.dot_general(
            at, at, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32, precision=HI)

    gm = jax.jit(lambda at: pl.pallas_call(
        gram_mxu_kernel, grid=(G,), in_specs=[sp(NT, m, n_pad)],
        out_specs=sp(NT, n_pad, n_pad),
        out_shape=jax.ShapeDtypeStruct((G, NT, n_pad, n_pad), f32),
        compiler_params=cp)(at))
    timeit("gram MXU batched dot_general (HIGHEST)", lambda: gm(At),
           lambda o: o[:1, :1, :1, :1])

    # 2b. same at DEFAULT precision (bf16 1-pass) for the rate ceiling
    def gram_mxu_d_kernel(at_ref, o_ref):
        at = at_ref[0]
        o_ref[0] = jax.lax.dot_general(
            at, at, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32)

    gmd = jax.jit(lambda at: pl.pallas_call(
        gram_mxu_d_kernel, grid=(G,), in_specs=[sp(NT, m, n_pad)],
        out_specs=sp(NT, n_pad, n_pad),
        out_shape=jax.ShapeDtypeStruct((G, NT, n_pad, n_pad), f32),
        compiler_params=cp)(at))
    timeit("gram MXU batched dot_general (DEFAULT/bf16)", lambda: gmd(At),
           lambda o: o[:1, :1, :1, :1])

    # ---- 3. back-transpose MXU -> VPU layout --------------------------------
    def bt_kernel(g_ref, o_ref):
        o_ref[0] = jnp.transpose(g_ref[0], (1, 2, 0))

    bt = jax.jit(lambda g: pl.pallas_call(
        bt_kernel, grid=(G,), in_specs=[sp(NT, n_pad, n_pad)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        compiler_params=cp)(g))
    timeit("back-transpose (NT,n,n)->(n,n,NT)", lambda: bt(Gt),
           lambda o: o[:1, :1, :1, :1])

    # ---- 4. full round trip in ONE kernel -----------------------------------
    def rt_kernel(a_ref, o_ref):
        at = jnp.transpose(a_ref[0], (2, 0, 1))        # (NT, m, n_pad)
        g = jax.lax.dot_general(
            at, at, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32, precision=HI)
        o_ref[0] = jnp.transpose(g, (1, 2, 0))         # (n, n, NT)

    rt = jax.jit(lambda a: pl.pallas_call(
        rt_kernel, grid=(G,), in_specs=[sp(m, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        compiler_params=cp)(a))
    timeit("gram via MXU incl. both transposes", lambda: rt(A),
           lambda o: o[:1, :1, :1, :1])

    # ---- 4b. Q = A Li^T on the MXU (both already in MXU layout) -------------
    Lt = jnp.asarray(rng.standard_normal((G, NT, n_pad, n_pad)) * 0.1, f32)

    def q_mxu_kernel(at_ref, lt_ref, o_ref):
        at = at_ref[0]                                 # (NT, m, n)
        lt = lt_ref[0]                                 # (NT, n, n) rows=Li rows
        # Q = A Li^T: contract A's col dim with Li's col dim
        o_ref[0] = jax.lax.dot_general(
            at, lt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32, precision=HI)

    qm = jax.jit(lambda at, lt: pl.pallas_call(
        q_mxu_kernel, grid=(G,), in_specs=[sp(NT, m, n_pad),
                                           sp(NT, n_pad, n_pad)],
        out_specs=sp(NT, m, n_pad),
        out_shape=jax.ShapeDtypeStruct((G, NT, m, n_pad), f32),
        compiler_params=cp)(at, lt))
    timeit("Q MXU batched dot_general (HIGHEST)", lambda: qm(At, Lt),
           lambda o: o[:1, :1, :1, :1])

    # ---- 4c. composite: everything the fused kernel would do on the MXU ----
    # transpose A once; Gram1; hand G1 back to VPU layout; take a Li proxy
    # from VPU layout (transpose in); Q; Gram2; hand G2 back.  This is the
    # exact stage set Gram1+Q+Gram2 costs if moved to the MXU, including
    # all four cross-layout transposes.
    def comp_kernel(a_ref, li_ref, g1_ref, g2_ref):
        at = jnp.transpose(a_ref[0], (2, 0, 1))       # (NT, m, n)
        g1 = jax.lax.dot_general(
            at, at, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32, precision=HI)
        g1_ref[0] = jnp.transpose(g1, (1, 2, 0))      # -> VPU layout
        lt = jnp.transpose(li_ref[0], (2, 0, 1))      # Li from VPU layout
        q = jax.lax.dot_general(
            at, lt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=f32, precision=HI)
        g2 = jax.lax.dot_general(
            q, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32, precision=HI)
        g2_ref[0] = jnp.transpose(g2, (1, 2, 0))

    Lv = jnp.asarray(rng.standard_normal((G, n_pad, n_pad, NT)) * 0.1, f32)
    cmp_ = jax.jit(lambda a, li: pl.pallas_call(
        comp_kernel, grid=(G,),
        in_specs=[sp(m, n_pad, NT), sp(n_pad, n_pad, NT)],
        out_specs=[sp(n_pad, n_pad, NT), sp(n_pad, n_pad, NT)],
        out_shape=[jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
                   jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32)],
        compiler_params=cp)(a, li))
    timeit("MXU composite Gram1+Q+Gram2 (4 transposes)",
           lambda: cmp_(A, Lv), lambda o: o[0][:1, :1, :1, :1])

    # ---- 5. VPU baseline -----------------------------------------------------
    def gram_vpu_kernel(a_ref, o_ref):
        dv = jnp.zeros((n_pad, NT), f32)
        _gram_cols_into(a_ref[0], o_ref.at[0], n_pad, dv)

    gv = jax.jit(lambda a: pl.pallas_call(
        gram_vpu_kernel, grid=(G,), in_specs=[sp(m, n_pad, NT)],
        out_specs=sp(n_pad, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, n_pad, n_pad, NT), f32),
        compiler_params=cp)(a))
    timeit("gram VPU slabbed (baseline)", lambda: gv(A),
           lambda o: o[:1, :1, :1, :1])

    def q_vpu_kernel(a_ref, li_ref, q_ref):
        _form_q(a_ref[0], li_ref[0], q_ref.at[0], m, n_pad)

    qv = jax.jit(lambda a, li: pl.pallas_call(
        q_vpu_kernel, grid=(G,),
        in_specs=[sp(m, n_pad, NT), sp(n_pad, n_pad, NT)],
        out_specs=sp(m, n_pad, NT),
        out_shape=jax.ShapeDtypeStruct((G, m, n_pad, NT), f32),
        compiler_params=cp)(a, li))
    timeit("Q VPU slab acc (baseline)", lambda: qv(A, Lv),
           lambda o: o[:1, :1, :1, :1])


if __name__ == "__main__":
    main()
