"""Parity of the fused Pallas Schur matvec (ops/pallas_matvec) against
the dual-layout XLA matvec, in interpreter mode on the CPU mesh.

The kernel must reproduce the f32 operator exactly (up to summation
order): CG at 1000-camera conditioning diverges under bf16-level
operator noise (measured, scripts/bench_matvec3.py), so the crossings
use 3-term exact bf16 splits. These tests pin that contract at H=1
(<=63 cameras) and H>1 (multi-tile one-hot), with frozen-camera masks
applied outside the kernel as in _cg_schur_solve.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from sat_bundleadjust_tpu.ba.solver import BASolver
from sat_bundleadjust_tpu.ops import lm as lm_ops
from sat_bundleadjust_tpu.ops import pallas_matvec as pmv
from sat_bundleadjust_tpu.ops import smallmat as sm
from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams


def _wz_system(n_cam, n_pts, seed=0):
    scene = make_scene_arrays(n_cam=n_cam, n_pts=n_pts, obs_per_pt=4,
                              rot_scale=2e-5, noise_px=0.1, seed=seed)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p)
    prob = solver.prob
    P, N, M = p.n_params, p.n_pts, p.n_cam
    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)
    r, J_cam, J_pt = solver.jac_fn(cam0, pts0)
    cfg = lm_ops.LMConfig(schur_mode="cg")
    _, _, _, U, V, W = lm_ops._normal_blocks(r, J_cam, J_pt, prob, M, N, cfg)
    Vinv = lm_ops._inv3x3(lm_ops._damp(V, 1e-4)).astype(jnp.float32)
    W = W.astype(jnp.float32)
    return p, prob, W, Vinv, P, N, M


def _wz_aos(x, W, Vinv, prob, P):
    W_pad = jnp.concatenate([W, jnp.zeros((1, P, 3), W.dtype)])
    W_pt = W_pad[prob.pt_gather]
    W_cm = W_pad[prob.cam_gather]
    xg = jnp.concatenate([x, jnp.zeros((1, P), x.dtype)])[
        prob.cam_ind_pt].astype(jnp.float32)
    wtx = jnp.sum(sm.mtv(W_pt, xg), axis=1)
    z = sm.mv(Vinv, wtx)
    zg = jnp.concatenate([z, jnp.zeros((1, 3), z.dtype)])[prob.pts_ind_cam]
    return jnp.sum(sm.mv(W_cm, zg), axis=1)


@pytest.mark.parametrize("n_cam,n_pts,block", [(37, 900, 128), (200, 2400, 256)])
def test_pallas_matvec_matches_aos(n_cam, n_pts, block):
    p, prob, W, Vinv, P, N, M = _wz_system(n_cam, n_pts)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(M, P)), jnp.float32)

    wz_aos = np.asarray(_wz_aos(x, W, Vinv, prob, P))
    Wh, c, meta = pmv.build_wh_operands(W, Vinv, prob, M, block_pts=block)
    assert meta["H"] == pmv._cdiv(M + 1, pmv.LO)
    wz_twin = np.asarray(pmv.schur_wz_reference(x, Wh, c, meta))
    wz_pal = np.asarray(pmv.schur_wz(x, Wh, c, meta, interpret=True))

    scale = np.abs(wz_aos).max()
    # the three paths differ only by f32 summation order; 3e-5 covers the
    # worst observed cancellation at these sizes
    assert np.abs(wz_twin - wz_aos).max() <= 3e-5 * scale
    assert np.abs(wz_pal - wz_aos).max() <= 3e-5 * scale
    # the kernel and its jnp twin share the split/mask algebra exactly
    assert np.abs(wz_pal - wz_twin).max() <= 3e-5 * scale


def test_pallas_matvec_linear_and_zero_preserving():
    """Linearity (it is a fixed linear operator, the CG contract) and
    zero input -> zero output (sentinel slots contribute nothing)."""
    p, prob, W, Vinv, P, N, M = _wz_system(37, 900)
    Wh, c, meta = pmv.build_wh_operands(W, Vinv, prob, M, block_pts=128)
    rng = np.random.default_rng(2)
    x1 = jnp.asarray(rng.normal(size=(M, P)), jnp.float32)
    x2 = jnp.asarray(rng.normal(size=(M, P)), jnp.float32)

    f = lambda v: np.asarray(pmv.schur_wz(v, Wh, c, meta, interpret=True))
    z = f(jnp.zeros((M, P), jnp.float32))
    assert np.all(z == 0.0)
    lin = f(x1 + 2.0 * x2)
    sep = f(x1) + 2.0 * f(x2)
    scale = max(np.abs(sep).max(), 1e-30)
    assert np.abs(lin - sep).max() <= 1e-5 * scale


def test_pallas_matvec_in_distributed_solver(monkeypatch):
    """The fused matvec must compose with shard_map (per-shard kernel +
    psum): distributed solve through the pallas path == aos path."""
    from sat_bundleadjust_tpu.parallel.dist_solver import make_distributed_solver
    from sat_bundleadjust_tpu.parallel.mesh import make_mesh

    monkeypatch.setenv("SATBA_PALLAS_INTERPRET", "1")
    scene = make_scene_arrays(n_cam=16, n_pts=2000, obs_per_pt=4,
                              rot_scale=2e-5, noise_px=0.1, seed=3)
    p = scene_to_baparams(scene, noise_pts=1.0)
    mesh = make_mesh()
    ls = {"ftol": 1e-30, "xtol": 1e-30, "max_iter": 4}
    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)

    outs = {}
    for mv in ("aos", "pallas"):
        solver = make_distributed_solver(p, dict(ls), mesh=mesh)
        solver.cfg = solver.cfg._replace(matvec=mv)
        cam, pts, info = solver.solve(cam0, pts0, cfg=solver.cfg)
        outs[mv] = (np.asarray(cam), np.asarray(info["err_fin"]))

    cam_a, err_a = outs["aos"]
    cam_p, err_p = outs["pallas"]
    assert abs(float(err_a.mean()) - float(err_p.mean())) <= 1e-4
    scale = max(np.abs(cam_a).max(), 1e-30)
    assert np.abs(cam_a - cam_p).max() <= 1e-4 * scale


def test_camera_side_wide_accumulation():
    """Round-5 contract: the kernel's camera-side reduction is a wide
    accumulator. The fixed-point slice twin must equal the f64
    segment-sum ground truth EXACTLY (every in-chunk f32 slice sum is an
    exactly-representable multiple of the slice ulp; the cross-chunk
    combine is f64), and the kernel itself must sit at the residual f32
    roundoff of the y chain — far below any f32 summation-order noise."""
    p, prob, W, Vinv, P, N, M = _wz_system(200, 2400)
    Wh, c, meta = pmv.build_wh_operands(W, Vinv, prob, M, block_pts=256)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(M, P)), jnp.float32)

    f64 = np.asarray(pmv.schur_wz_twin(x, Wh, c, meta, accum="f64"))
    sl = np.asarray(pmv.schur_wz_twin(x, Wh, c, meta, accum="slice"))
    pal = np.asarray(pmv.schur_wz(x, Wh, c, meta, interpret=True))
    scale = np.abs(f64).max()
    assert np.array_equal(sl, f64)
    assert np.abs(pal - f64).max() <= 2e-7 * scale


def test_solve_quality_wide_accumulator_twins():
    """Full LM solves through the point-major twins reach the aos solve's
    optimum (the round-4 degradation scenario, pinned at suite scale)."""
    from sat_bundleadjust_tpu.ops import lm as lm_ops

    scene = make_scene_arrays(n_cam=100, n_pts=8000, obs_per_pt=4,
                              rot_scale=2e-5, noise_px=0.1, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    solver = BASolver(p, schur_mode="cg")
    cam0 = jnp.asarray(p.opt_block())
    pts0 = jnp.asarray(p.pts3d)

    errs = {}
    for mv in ("aos", "twin_slice"):
        cfg = lm_ops.LMConfig(schur_mode="cg", matvec=mv, max_iter=30)
        _, _, info = lm_ops.solve(
            solver.residual_fn, solver.jac_fn, cam0, pts0, solver.prob, cfg,
            run=solver._get_run(cfg))
        errs[mv] = float(np.mean(info["err_fin"]))
    assert errs["aos"] < 0.2
    assert errs["twin_slice"] <= errs["aos"] + 5e-3
