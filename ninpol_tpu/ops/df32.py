"""Double-float32 ("df32") arithmetic: ~2^-48 precision from float32 ops.

TPU v5e has no float64 hardware; XLA's x64 emulation works but lowers
every op to multi-pass sequences that dominated the GLS kernel runtime
and compile time.  This module implements the classical error-free
transformations (Dekker/Knuth/Ogita-Rump) on float32 PAIRS (hi, lo) so
the mixed-precision refinement can run at VPU speed:

  * two_sum / fast_two_sum   — exact a+b = s + e
  * split / two_prod         — exact a*b = p + e (Veltkamp splitting;
                               no FMA assumed)
  * add / mul / from_f64 / to_f64 — df32 arithmetic
  * tree_sum                 — pairwise df32 reduction along an axis
                               (parallel, depth log2 n, error ~depth*2^-48)

Numerical contract: |result - exact| <= ~2^-44 relative after a depth-8
tree — validated on-device by tests (XLA must not reassociate these
expressions; IEEE semantics hold for TPU f32 adds/muls).
"""
from __future__ import annotations

import jax.numpy as jnp

_SPLITTER = 4097.0  # 2^12 + 1 for binary32 Veltkamp splitting


def two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Requires |a| >= |b| (or a == 0)."""
    s = a + b
    e = b - (s - a)
    return s, e


def split(a):
    c = _SPLITTER * a
    hi = c - (c - a)
    lo = a - hi
    return hi, lo


def two_prod(a, b):
    p = a * b
    a1, a2 = split(a)
    b1, b2 = split(b)
    e = ((a1 * b1 - p) + a1 * b2 + a2 * b1) + a2 * b2
    return p, e


def add(x, y):
    """df32 + df32 -> df32 (Dekker add2, ~2^-47 relative)."""
    xh, xl = x
    yh, yl = y
    s, e = two_sum(xh, yh)
    e = e + (xl + yl)
    return fast_two_sum(s, e)


def mul(x, y):
    """df32 * df32 -> df32."""
    xh, xl = x
    yh, yl = y
    p, e = two_prod(xh, yh)
    e = e + (xh * yl + xl * yh)
    return fast_two_sum(p, e)


def neg(x):
    return -x[0], -x[1]


def from_f32(a):
    return a, jnp.zeros_like(a)


def from_f64(a):
    hi = a.astype(jnp.float32)
    lo = (a - hi.astype(a.dtype)).astype(jnp.float32)
    return hi, lo


def to_f64(x):
    return x[0].astype(jnp.float64) + x[1].astype(jnp.float64)


def scale(x, s32):
    """df32 * plain f32 -> df32."""
    xh, xl = x
    p, e = two_prod(xh, s32)
    e = e + xl * s32
    return fast_two_sum(p, e)


def tree_sum(x, axis):
    """Pairwise df32 reduction along ``axis`` (padded to a power of two
    with zeros).  Fully parallel: depth log2(n) df32 adds.  Uses static
    slices only (Pallas-compatible)."""
    import jax.lax as lax
    xh, xl = x
    n = xh.shape[axis]
    p = 1
    while p < n:
        p *= 2
    if p != n:
        pad = [(0, 0)] * xh.ndim
        pad[axis] = (0, p - n)
        xh = jnp.pad(xh, pad)
        xl = jnp.pad(xl, pad)
    while xh.shape[axis] > 1:
        h = xh.shape[axis] // 2
        a = (lax.slice_in_dim(xh, 0, h, axis=axis),
             lax.slice_in_dim(xl, 0, h, axis=axis))
        b = (lax.slice_in_dim(xh, h, 2 * h, axis=axis),
             lax.slice_in_dim(xl, h, 2 * h, axis=axis))
        xh, xl = add(a, b)
    return jnp.squeeze(xh, axis), jnp.squeeze(xl, axis)


def div(x, y):
    """df32 / df32 -> df32 (one Newton-style correction)."""
    xh, xl = x
    yh, yl = y
    q0 = xh / yh
    # r = x - q0*y  computed exactly-ish
    p, e = two_prod(q0, yh)
    rh = ((xh - p) - e) + xl - q0 * yl
    q1 = rh / yh
    return fast_two_sum(q0, q1)


def sqrt(x):
    """df32 sqrt (non-negative input; one correction step)."""
    xh, xl = x
    s = jnp.sqrt(xh)
    safe = jnp.where(s > 0, s, 1.0)
    p, e = two_prod(s, s)
    r = ((xh - p) - e) + xl
    lo = jnp.where(s > 0, r / (2.0 * safe), 0.0)
    return fast_two_sum(s, lo)


def dot3(x, y, axis=-1):
    """df32 dot over a SMALL axis (e.g. the 3 spatial components):
    products via two_prod, sequential df32 accumulation (exact order)."""
    xh, xl = x
    yh, yl = y
    n = xh.shape[axis]
    acc = None
    for k in range(n):
        a = (jnp.take(xh, k, axis=axis), jnp.take(xl, k, axis=axis))
        b = (jnp.take(yh, k, axis=axis), jnp.take(yl, k, axis=axis))
        p = mul(a, b)
        acc = p if acc is None else add(acc, p)
    return acc
