"""Pallas 2-NN matching kernel vs the lax reference implementation
(interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp

from sat_bundleadjust_tpu.ops.match import match_descriptors_2nn
from sat_bundleadjust_tpu.ops.pallas_match import pallas_2nn


def _random_problem(n1=300, n2=700, seed=0):
    rng = np.random.RandomState(seed)
    d1 = rng.rand(n1, 128).astype(np.float32) * 50
    d2 = rng.rand(n2, 128).astype(np.float32) * 50
    # make some exact correspondences
    d2[:100] = d1[:100] + 0.01 * rng.randn(100, 128).astype(np.float32)
    p1 = rng.rand(n1, 2).astype(np.float32) * 500
    p2 = rng.rand(n2, 2).astype(np.float32) * 500
    v1 = np.ones(n1, bool)
    v2 = np.ones(n2, bool)
    v1[-7:] = False
    v2[-11:] = False
    return d1, d2, p1, p2, v1, v2


def test_pallas_kernel_matches_lax_no_gating():
    d1, d2, p1, p2, v1, v2 = _random_problem()
    # gating disabled: lines (0, 0, 1) never reject (0 <= thr^2 * 0 is
    # False, so use lines with nonzero a/b and a huge threshold)
    lines = np.tile(np.array([[1.0, 0.0, 0.0]], np.float32), (len(d1), 1))
    hp2 = np.hstack([p2, np.ones((len(d2), 1), np.float32)])
    pd1, pd2, pidx = pallas_2nn(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(lines), jnp.asarray(hp2),
        jnp.asarray(v1, jnp.float32), jnp.asarray(v2, jnp.float32), 1e9,
        interpret=True,
    )
    nn_idx, accepted, l_d1 = match_descriptors_2nn(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(p1), jnp.asarray(p2),
        jnp.asarray(v1), jnp.asarray(v2), F=None, rel_thr=0.8,
    )
    valid = v1
    np.testing.assert_allclose(
        np.asarray(pd1)[valid], np.asarray(l_d1)[valid], rtol=1e-4, atol=1e-2
    )
    agree = np.asarray(pidx)[valid] == np.asarray(nn_idx)[valid]
    assert np.mean(agree) > 0.999, np.mean(agree)


def test_pallas_kernel_epipolar_gating():
    d1, d2, p1, p2, v1, v2 = _random_problem(seed=1)
    # horizontal epipolar lines through each left point: y_j must be close
    # to y_i -> line (0, 1, -y_i)
    lines = np.stack(
        [np.zeros(len(d1)), np.ones(len(d1)), -p1[:, 1]], axis=1
    ).astype(np.float32)
    hp2 = np.hstack([p2, np.ones((len(d2), 1), np.float32)])
    thr = 30.0
    pd1, pd2, pidx = pallas_2nn(
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(lines), jnp.asarray(hp2),
        jnp.asarray(v1, jnp.float32), jnp.asarray(v2, jnp.float32), thr,
        interpret=True,
    )
    pd1 = np.asarray(pd1)
    pidx = np.asarray(pidx)
    found = pd1 < 1e11
    # every reported neighbour must satisfy the gate
    dy = np.abs(p2[pidx[found], 1] - p1[found, 1])
    assert np.max(dy) <= thr + 1e-3
    # and some pairs must pass (positions are uniform, thr=30/500)
    assert found.sum() > 10
