"""Analytic Jacobians must match forward-mode AD through the same chain."""

import jax
import jax.numpy as jnp
import numpy as np

from synthetic import synthetic_scene

from sat_bundleadjust_tpu.ba.params import BAParams
from sat_bundleadjust_tpu.ba.solver import _obs_residual_fn
from sat_bundleadjust_tpu.ops.jacobians import residuals_and_jacobians_rpc


def test_analytic_jacobian_matches_ad():
    scene = synthetic_scene(n_cam=3, n_pts=40, rot_scale=1e-5, seed=6)
    p = BAParams(scene["C"], scene["pts3d"], scene["cameras"], "rpc",
                 scene["pairs_to_triangulate"], scene["camera_centers"],
                 {"verbose": False, "correction_params": ["R", "T"]})
    n_params = p.n_params
    assert n_params == 6

    cam_full = jnp.asarray(p.cam_params)
    pts = jnp.asarray(p.pts3d) + 0.5  # move off the exact solution
    pts_ind = jnp.asarray(p.pts_ind)
    cam_ind = jnp.asarray(p.cam_ind)
    pts2d = jnp.asarray(p.pts2d)
    w = jnp.asarray(p.pts2d_w)

    from sat_bundleadjust_tpu.ops.fastgeo import anchors_from_rpcs

    anchors = {k: jnp.asarray(v) for k, v in anchors_from_rpcs(p.rpcs).items()}
    r_a, J_cam_a, J_pt_a = residuals_and_jacobians_rpc(
        pts, p.rpcs, cam_full, pts_ind, cam_ind, pts2d, w, n_params, anchors
    )

    obs_fn = _obs_residual_fn("rpc", n_params)
    rpcs_k = jax.tree.map(lambda leaf: jnp.asarray(leaf)[cam_ind], p.rpcs)
    cam_opt = cam_full[:, :n_params]
    cam_tail = cam_full[:, n_params:]
    r_b = jax.vmap(obs_fn)(cam_opt[cam_ind], pts[pts_ind], cam_tail[cam_ind], rpcs_k, pts2d, w)
    J_cam_b, J_pt_b = jax.vmap(jax.jacfwd(obs_fn, argnums=(0, 1)))(
        cam_opt[cam_ind], pts[pts_ind], cam_tail[cam_ind], rpcs_k, pts2d, w
    )

    # the analytic path evaluates the geodetic chain transcendental-free
    # (ops/fastgeo.py); agreement with the trig-based chain is ~1e-10 px
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_b), rtol=1e-9, atol=1e-8)
    # J vs AD: the analytic geodetic derivative uses the exact inverse
    # function theorem while AD differentiates the approximate inverse
    # formula; they agree to ~1e-6 relative
    np.testing.assert_allclose(np.asarray(J_pt_a), np.asarray(J_pt_b), rtol=2e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(J_cam_a), np.asarray(J_cam_b), rtol=2e-5,
                               atol=1e-6 * float(np.abs(np.asarray(J_cam_b)).max()))
