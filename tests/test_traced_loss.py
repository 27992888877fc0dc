"""The robust loss as a traced operand of the compiled LM program.

Compilation is expensive on remote/tunneled TPUs, and the pipeline solves
the same problem structure under several losses (soft-L1 round, linear
outlier probe, final L2 round — reference: ba_pipeline.py:326-341 +
ba_outliers.py). ops/robust exposes the loss as an integer id dispatched
with lax.switch inside the program, so every loss shares ONE compilation
per problem shape. These tests pin (a) switch-vs-string equivalence for
every loss, (b) single-program reuse in BASolver, (c) the distributed
solver's per-round loss override."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sat_bundleadjust_tpu.ops.robust import LOSSES, loss_cost, loss_id, loss_scale

from synthetic import synthetic_scene
from test_solver import make_params


@pytest.mark.parametrize("loss", LOSSES)
def test_traced_loss_matches_static(loss):
    rng = np.random.RandomState(0)
    r = jnp.asarray(rng.randn(64, 2) * 3.0)
    for f_scale in (1.0, 2.5):
        s_static = loss_scale(loss, r, f_scale)
        c_static = loss_cost(loss, r, f_scale)

        @jax.jit
        def traced(lid, fs):
            return loss_scale(lid, r, fs), loss_cost(lid, r, fs)

        s_traced, c_traced = traced(
            jnp.asarray(loss_id(loss), jnp.int32), jnp.asarray(f_scale, jnp.float32)
        )
        np.testing.assert_allclose(np.asarray(s_traced), np.asarray(s_static), rtol=1e-6)
        np.testing.assert_allclose(float(c_traced), float(c_static), rtol=1e-6)


def test_basolver_shares_one_program_across_losses():
    """Solving the same problem under different losses must reuse ONE
    compiled run (the loss is an operand, not a compile key), and each
    solve must match a fresh single-loss solver bit-for-bit."""
    from sat_bundleadjust_tpu.ba.solver import BASolver

    scene = synthetic_scene(n_cam=4, n_pts=80, rot_scale=1e-5, seed=7)
    p = make_params(scene)
    shared = BASolver(p)
    results = {}
    for loss in ("soft_l1", "linear", "cauchy"):
        _, (cam, _), _, err, _ = shared.solve({"loss": loss, "max_iter": 20})
        results[loss] = (np.asarray(cam), np.asarray(err))
    assert len(shared._runs) == 1, "losses must share one compiled LM driver"

    for loss in ("soft_l1", "linear"):
        fresh = BASolver(make_params(scene))
        _, (cam_f, _), _, err_f, _ = fresh.solve({"loss": loss, "max_iter": 20})
        np.testing.assert_allclose(results[loss][0], np.asarray(cam_f), atol=0)
        np.testing.assert_allclose(results[loss][1], np.asarray(err_f), atol=0)

    # the losses genuinely differ (the switch is not stuck on one branch)
    assert not np.allclose(results["soft_l1"][1], results["cauchy"][1])


def test_distributed_solver_reuse_across_losses():
    """One DistributedLM instance serves soft-L1 and L2 rounds via the
    per-round cfg override, matching per-loss single-device solves."""
    from sat_bundleadjust_tpu.ba.solver import run_ba_optimization
    from sat_bundleadjust_tpu.parallel.dist_solver import (
        make_distributed_solver,
        run_ba_optimization_distributed,
    )
    from sat_bundleadjust_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    scene = synthetic_scene(n_cam=4, n_pts=80, rot_scale=1e-5, seed=11)
    p = make_params(scene)
    mesh = make_mesh()
    solver = make_distributed_solver(p, {"max_iter": 25}, mesh=mesh)
    for loss in ("soft_l1", "linear"):
        _, _, _, err_d, _ = run_ba_optimization_distributed(
            p, {"loss": loss, "max_iter": 25}, mesh=mesh, solver=solver
        )
        p_ref = make_params(scene)
        _, _, _, err_s, _ = run_ba_optimization(
            p_ref, {"loss": loss, "max_iter": 25}, schur_mode="cg"
        )
        assert np.mean(err_d) < 1e-2, (loss, np.mean(err_d))
        # both reach the same basin; exact iterates differ (psum order)
        np.testing.assert_allclose(
            np.mean(err_d), np.mean(err_s), atol=1e-3
        )


def test_ransac_many_matches_per_pair_numpy():
    """ransac_fundamental_many must be bit-identical to the per-pair numpy
    RANSAC path (same sampling, dtypes and refit) for every pair."""
    from sat_bundleadjust_tpu.ops.ransac import _ransac_numpy, ransac_fundamental_many

    rng = np.random.RandomState(3)
    pts1_list, pts2_list = [], []
    for b, n in enumerate([60, 200, 8, 500]):
        # points related by a random fundamental-compatible affine map +
        # noise, with 20% gross outliers
        p1 = rng.rand(n, 2) * 1000
        A = np.eye(2) + rng.randn(2, 2) * 0.01
        t = rng.randn(2) * 5
        p2 = p1 @ A.T + t + rng.randn(n, 2) * 0.05
        n_out = max(1, n // 5)
        p2[:n_out] += rng.randn(n_out, 2) * 50
        pts1_list.append(p1)
        pts2_list.append(p2)

    many = ransac_fundamental_many(pts1_list, pts2_list, thr=0.3, seed=0, adaptive=False)
    for (p1, p2, (F_m, inl_m)) in zip(pts1_list, pts2_list, many):
        valid = np.isfinite(p1[:, 0]) & np.isfinite(p2[:, 0])
        F_s, inl_s = _ransac_numpy(
            p1.astype(np.float64), p2.astype(np.float64), valid, 0.3, 0, 512, True
        )
        if F_s is None:
            assert F_m is None
            continue
        np.testing.assert_array_equal(inl_m, inl_s)
        # F is defined up to sign (SVD null-vector ambiguity)
        sign = np.sign(np.sum(F_m * F_s)) or 1.0
        np.testing.assert_allclose(sign * F_m, F_s, rtol=1e-4, atol=1e-7)


def test_ransac_many_adaptive_quality():
    """The adaptive stopping rule must find (nearly) the same inlier sets
    as the fixed-512 sweep on both clean and contaminated pairs."""
    from sat_bundleadjust_tpu.ops.ransac import ransac_fundamental_many

    rng = np.random.RandomState(5)
    pts1_list, pts2_list = [], []
    for frac_out in (0.02, 0.2, 0.5):
        n = 400
        p1 = rng.rand(n, 2) * 1000
        p2 = p1 + rng.randn(n, 2) * 0.03
        n_out = int(n * frac_out)
        p2[:n_out] += rng.randn(n_out, 2) * 40
        pts1_list.append(p1)
        pts2_list.append(p2)

    fixed = ransac_fundamental_many(pts1_list, pts2_list, thr=0.3, adaptive=False)
    adapt = ransac_fundamental_many(pts1_list, pts2_list, thr=0.3, adaptive=True)
    for (F_f, inl_f), (F_a, inl_a) in zip(fixed, adapt):
        assert inl_a is not None
        # at 99% confidence the adaptive set recovers essentially the same
        # inliers (identical on clean pairs, within a few on dirty ones)
        agree = np.mean(inl_a == inl_f)
        assert agree > 0.97, agree
