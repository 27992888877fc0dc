"""Self-contained synthetic scenes (no data files needed).

Used by __graft_entry__.py, bench.py and examples: builds plausible RPC
cameras programmatically (first-order rational models with per-camera
parallax) and generates ground-truth-controlled BA problems of any size."""

import contextlib

import numpy as np

from sat_bundleadjust_tpu.models import ellipsoid
from sat_bundleadjust_tpu.models.rpc import RPCModel, stack_rpcs


def _nullcontext():
    return contextlib.nullcontext()


def make_synthetic_rpc(lon0=-72.71, lat0=11.02, view_dx=0.0, view_dy=0.0,
                       img_halfsize=(1600.0, 675.0)):
    """A well-conditioned synthetic RPC: linear in normalized ground coords
    with a per-camera altitude parallax term (view_dx/view_dy, px per
    normalized alt). Valid domain: |L|,|P| <= 1, |H| <= 1."""
    colh, rowh = img_halfsize
    zeros = np.zeros(20)

    def poly(lin_l, lin_p, lin_h):
        p = zeros.copy()
        p[1], p[2], p[3] = lin_l, lin_p, lin_h
        return p

    den = zeros.copy()
    den[0] = 1.0
    line_num = poly(0.08, 1.0, view_dy / rowh)
    samp_num = poly(1.0, -0.06, view_dx / colh)
    return RPCModel(
        line_num=line_num, line_den=den.copy(),
        samp_num=samp_num, samp_den=den.copy(),
        row_offset=rowh, col_offset=colh,
        lat_offset=lat0, lon_offset=lon0, alt_offset=50.0,
        row_scale=rowh, col_scale=colh,
        lat_scale=0.02, lon_scale=0.03, alt_scale=600.0,
    )


def make_scene_arrays(n_cam=8, n_pts=2000, obs_per_pt=None, rot_scale=2e-5,
                      noise_px=0.1, seed=0):
    """Build a flat synthetic BA problem (observation-table form).

    Returns dict: rpcs (batched pytree), cam_params (M, 9) at truth,
    cam_params0 (M, 9) zero-rotation start, pts3d (N, 3),
    pts_ind/cam_ind/pts2d/weights observation tables."""
    import jax
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.ops import project as project_ops

    rng = np.random.RandomState(seed)
    rpcs = [
        make_synthetic_rpc(view_dx=300.0 * np.cos(2 * np.pi * i / n_cam),
                           view_dy=300.0 * np.sin(2 * np.pi * i / n_cam))
        for i in range(n_cam)
    ]
    batched = stack_rpcs(rpcs)

    lon0, lat0 = -72.71, 11.02
    lons = lon0 + 0.02 * rng.uniform(-1, 1, n_pts)
    lats = lat0 + 0.015 * rng.uniform(-1, 1, n_pts)
    alts = 50.0 + 100.0 * rng.uniform(-1, 1, n_pts)
    pts3d = np.asarray(ellipsoid.latlon_to_ecef_arr(jnp.asarray(lats), jnp.asarray(lons), jnp.asarray(alts)))

    ground = pts3d.mean(axis=0)
    up = ground / np.linalg.norm(ground)
    centers = np.stack(
        [ground + up * 500000.0 + np.array([1.0, 0, 0]) * (i - n_cam / 2) * 60000.0 for i in range(n_cam)]
    )

    cam_params_true = np.zeros((n_cam, 9))
    cam_params_true[:, :3] = rot_scale * rng.uniform(-1, 1, (n_cam, 3))
    cam_params_true[:, 6:9] = centers

    if obs_per_pt is None:
        obs_per_pt = min(n_cam, 4)
    # each point observed by obs_per_pt consecutive cameras (ring)
    start = rng.randint(0, n_cam, n_pts)
    cam_ind = ((start[:, None] + np.arange(obs_per_pt)[None, :]) % n_cam).reshape(-1)
    pts_ind = np.repeat(np.arange(n_pts), obs_per_pt)

    # scene generation is host-side setup: pin it to CPU so it does not pay
    # a (slow, remote) accelerator compilation
    try:
        # local_devices, not devices: in a multi-process (jax.distributed)
        # deployment global device 0 may belong to another process, and
        # dispatching to a non-addressable device is fatal
        cpu0 = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu0 = None
    ctx = jax.default_device(cpu0) if cpu0 is not None else _nullcontext()
    with ctx:
        obs = np.array(
            project_ops.project_rpc(
                jnp.asarray(pts3d), batched, jnp.asarray(cam_params_true),
                jnp.asarray(pts_ind.astype(np.int32)), jnp.asarray(cam_ind.astype(np.int32)),
            )
        )
    obs += noise_px * rng.randn(*obs.shape)

    cam_params0 = cam_params_true.copy()
    cam_params0[:, :6] = 0.0

    return {
        "rpcs": batched,
        "rpc_list": rpcs,
        "cam_params_true": cam_params_true,
        "cam_params0": cam_params0,
        "camera_centers": centers,
        "pts3d": pts3d,
        "pts_ind": pts_ind.astype(np.int32),
        "cam_ind": cam_ind.astype(np.int32),
        "pts2d": obs,
        "weights": np.ones(len(pts_ind)),
    }


def scene_to_baparams(scene, noise_pts=1.0, verbose=False, dense_c=False):
    """Wrap make_scene_arrays output into a BAParams problem (perturbed
    starting points). Default: the flat-table constructor
    (BAParams.from_obs_table) — a dense C matrix is (2M, N) f64 and
    dominated host RSS at benchmark scale; pass dense_c=True to exercise
    the C-matrix path (the two yield identical problems, pinned in
    tests/test_ba_layers.py)."""
    from sat_bundleadjust_tpu.ba.params import BAParams

    n_cam = scene["cam_params0"].shape[0]
    n_pts = scene["pts3d"].shape[0]
    pairs = [(i, j) for i in range(n_cam) for j in range(i + 1, n_cam)]
    rng = np.random.RandomState(1)
    pts0 = scene["pts3d"] + noise_pts * rng.randn(n_pts, 3)
    if dense_c:
        C = np.full((2 * n_cam, n_pts), np.nan)
        C[2 * scene["cam_ind"], scene["pts_ind"]] = scene["pts2d"][:, 0]
        C[2 * scene["cam_ind"] + 1, scene["pts_ind"]] = scene["pts2d"][:, 1]
        return BAParams(
            C, pts0, scene["rpc_list"], "rpc", pairs,
            [c for c in scene["camera_centers"]], {"verbose": verbose},
        )
    return BAParams.from_obs_table(
        scene["pts_ind"], scene["cam_ind"], scene["pts2d"], pts0,
        scene["rpc_list"], "rpc", [c for c in scene["camera_centers"]],
        pairs, {"verbose": verbose},
    )


def render_synthetic_images(n_cam=4, h=300, w=400, seed=0, alt=50.0,
                            lon0=-72.71, lat0=11.02, span=0.035):
    """Render n_cam views of a shared smooth ground texture through
    synthetic RPC cameras (pixel value = texture at the localized ground
    position). Exercises the real detection -> matching -> tracks stage on
    imagery with true cross-view correspondence; used by bench.py's
    tracks mode and demos.

    Returns (images [n_cam arrays (h, w) float32 in [0, 1]], rpcs)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(seed)
    n = 1024
    tex = np.zeros((n, n))
    for o in range(4):
        tex += gaussian_filter(rng.randn(n, n), sigma=2.0 ** (o + 1)) * 2.0 ** o
    tex = (tex - tex.min()) / (tex.max() - tex.min())

    images, rpcs = [], []
    cols, rows = np.meshgrid(np.arange(w, dtype=np.float64), np.arange(h, dtype=np.float64))
    alts = np.full(cols.size, alt)
    for i in range(n_cam):
        rpc = make_synthetic_rpc(
            lon0=lon0, lat0=lat0,
            view_dx=250.0 * np.cos(2 * np.pi * i / n_cam),
            view_dy=250.0 * np.sin(2 * np.pi * i / n_cam),
            img_halfsize=(w / 2.0, h / 2.0),
        )
        lons, lats = rpc.localization(cols.ravel(), rows.ravel(), alts)
        u = np.clip((np.asarray(lons) - (lon0 - span)) / (2 * span) * (n - 1), 0, n - 1.001)
        v = np.clip((np.asarray(lats) - (lat0 - span)) / (2 * span) * (n - 1), 0, n - 1.001)
        u0 = np.floor(u).astype(int)
        v0 = np.floor(v).astype(int)
        fu, fv = u - u0, v - v0
        vals = ((1 - fv) * ((1 - fu) * tex[v0, u0] + fu * tex[v0, u0 + 1])
                + fv * ((1 - fu) * tex[v0 + 1, u0] + fu * tex[v0 + 1, u0 + 1]))
        images.append(vals.reshape(h, w).astype(np.float32))
        rpcs.append(rpc)
    return images, rpcs
