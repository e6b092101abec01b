"""Regression tests for the shared bucket-output delivery
(ninpol_tpu/_methods/device_grid.deliver_weights): multi-group fetches
with thread-overlapped host writes, jitted column padding, valid-row
masking, and the device_out consolidation."""
import numpy as np
import jax.numpy as jnp

from ninpol_tpu._methods.device_grid import deliver_weights


def _mk_launched(rng, n_buckets, ncols_out, n_target):
    """Synthetic bucket outputs with distinct widths, paddings and
    interleaved positions (like a real multi-chunk plan)."""
    launched = []
    expected = np.zeros((n_target, ncols_out))
    perm = rng.permutation(n_target)
    lo = 0
    for i in range(n_buckets):
        B = int(rng.integers(4, 9))            # padded batch
        take = int(rng.integers(1, B + 1))     # real rows
        ncols = int(rng.integers(2, ncols_out + 1))
        pos = np.full(B, -1, dtype=np.int64)
        pos[:take] = perm[lo:lo + take]
        lo += take
        w = rng.normal(size=(B, ncols))
        launched.append((
            {"pos": pos, "valid": pos >= 0},
            jnp.asarray(w),
        ))
        expected[pos[:take], :ncols] = w[:take]
    return launched, expected


def test_multi_group_host_delivery_matches_expected():
    rng = np.random.default_rng(7)
    n_target, ncols_out = 64, 6
    # 6 buckets -> 4 fetch groups (threaded overlap path)
    launched, expected = _mk_launched(rng, 6, ncols_out, n_target)
    weights = np.zeros((n_target, ncols_out))
    neumann = np.zeros(n_target)
    w2, _ = deliver_weights(launched, weights, neumann, n_target,
                            device_out=False)
    assert w2 is weights
    np.testing.assert_array_equal(weights, expected)


def test_single_bucket_host_delivery_matches_expected():
    rng = np.random.default_rng(8)
    n_target, ncols_out = 16, 5
    launched, expected = _mk_launched(rng, 1, ncols_out, n_target)
    weights = np.zeros((n_target, ncols_out))
    neumann = np.zeros(n_target)
    deliver_weights(launched, weights, neumann, n_target,
                    device_out=False)
    np.testing.assert_array_equal(weights, expected)


def test_device_out_matches_host_delivery():
    rng = np.random.default_rng(9)
    n_target, ncols_out = 48, 6
    launched, expected = _mk_launched(rng, 5, ncols_out, n_target)
    wdev = deliver_weights(launched, np.zeros((n_target, ncols_out)),
                           np.zeros(n_target), n_target, device_out=True)
    wd = np.asarray(wdev)
    assert wd.shape == (n_target, ncols_out + 1)
    np.testing.assert_array_equal(wd[:, :ncols_out], expected)
    np.testing.assert_array_equal(wd[:, ncols_out], 0.0)


def test_delivery_f32_rounds_but_matches():
    rng = np.random.default_rng(10)
    n_target, ncols_out = 32, 4
    launched, expected = _mk_launched(rng, 5, ncols_out, n_target)
    weights = np.zeros((n_target, ncols_out))
    deliver_weights(launched, weights, np.zeros(n_target), n_target,
                    device_out=False, delivery_f32=True)
    np.testing.assert_array_equal(weights,
                                  expected.astype(np.float32))
