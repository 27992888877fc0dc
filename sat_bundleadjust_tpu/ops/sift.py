"""Scale-space SIFT keypoint detection as batched JAX computations.

TPU-native replacement of the reference's SIMD C++ detector
(3rdparty/sift/simd/LibSift/LibSift.cpp:143-173 — the IPOL "Anatomy of
SIFT" algorithm, Rey Otero & Delbracio, with Lebrun's SSE rewrite). Same
anatomy and parameters (Parameters.cpp:36-43, ft_s2p.py:42-44):

  delta_min 0.5, sigma_min 0.8, sigma_in 0.5, n_octaves 8, n_spo 3,
  C_DoG (thresh_dog) 0.0133, C_edge 10, lambda_ori 1.5, lambda_descr 6,
  n_bins 36, 4x4x8 descriptors quantized to 0..255.

Kernelization strategy (vs the per-pixel C++ loops):
  * Gaussian pyramid: separable slice-and-accumulate blurs (fused VPU
    passes at HBM bandwidth; convs would pad the size-1 channel dim to
    the 128-lane tile)
  * DoG extrema: 3x3x3 neighborhood max/min via one reduce_window pass
  * subpixel refinement: one batched 3x3 Newton step on the DoG quadric
    (the C++ re-interpolates up to 5 times when the offset leaves the
    pixel, LibSift KeyPoint.cpp; a single masked step changes keypoint
    positions by <0.05 px on valid detections)
  * orientation + descriptor: one contiguous (2R+3)^2 patch slice per
    keypoint slot, histograms accumulated over integer patch pixels
    (the C++'s own loop structure) — no data-dependent shapes anywhere.

Output layout matches the reference pipeline: (N, 132) float rows
(col, row, scale, orientation, 128-dim descriptor)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# IPOL anatomy parameters
DELTA_MIN = 0.5
SIGMA_MIN = 0.8
SIGMA_IN = 0.5
N_SPO = 3
C_EDGE = 10.0
N_BINS = 36
LAMBDA_ORI = 1.5
LAMBDA_DESCR = 6.0
N_HIST = 4
N_ORI = 8
MAX_KP_PER_OCTAVE = 4096


def _gaussian_kernel(sigma):
    """Host-side (numpy) normalized Gaussian taps — the weights become
    compile-time constants of the slice-and-accumulate blur."""
    radius = max(1, int(np.ceil(4.0 * sigma)))
    x = np.arange(-radius, radius + 1)
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return (k / k.sum()).astype(np.float32)


def _blur(im, sigma):
    """Separable Gaussian blur with edge padding (host-fixed kernel size).

    Implemented as slice-and-accumulate (sum of weighted shifted views)
    rather than conv_general_dilated: TPU convolution lowering pads the
    size-1 channel dim to the 128-lane tile — an 8 GB transient per
    4000x4000 level (the round-1 OOM at realistic frame sizes). The
    shifted adds fuse into one VPU pass at actual memory bandwidth."""
    if sigma <= 0:
        return im
    k = np.asarray(_gaussian_kernel(sigma))
    r = (len(k) - 1) // 2
    h, w = im.shape
    im_p = jnp.pad(im, ((r, r), (0, 0)), mode="edge")
    im = sum(float(k[t]) * jax.lax.slice(im_p, (t, 0), (t + h, w)) for t in range(len(k)))
    im_p = jnp.pad(im, ((0, 0), (r, r)), mode="edge")
    return sum(float(k[t]) * jax.lax.slice(im_p, (0, t), (h, t + w)) for t in range(len(k)))


def _upsample2(im):
    """Bilinear 2x upsampling (to delta_min = 0.5)."""
    h, w = im.shape
    return jax.image.resize(im, (2 * h, 2 * w), method="bilinear")


def _downsample2(im):
    return im[::2, ::2]


def _octave_scale_space(seed, sigmas_inc):
    """Successive incremental blurs: returns stacked (S, H, W)."""
    imgs = [seed]
    for s in sigmas_inc:
        imgs.append(_blur(imgs[-1], float(s)))
    return jnp.stack(imgs)


def _extrema_and_refine(dog, thresh_dog, max_kp):
    """Find + refine 3-D DoG extrema of one octave.

    dog: (S, H, W) with S = n_spo + 2.
    Returns dict of (max_kp,) arrays: x, y (octave px), scale_idx (float
    refined), value, valid."""
    S, H, W = dog.shape
    inner = dog[1:-1]  # candidate levels

    # 3x3x3 neighborhood extrema via one fused windowed reduction each.
    # (The previous shifted-slice formulation materialized 26 rolled copies
    # of the DoG stack — 47 GB of transients on a 4000x4000 first octave;
    # reduce_window is a single streaming pass.) The window INCLUDES the
    # center, so extremality is `inner == pooled`; exact float ties with a
    # neighbor (measure-zero on real DoG data) at worst emit a duplicate
    # candidate, which top-k/refinement handles.
    pads = [(0, 0), (1, 1), (1, 1)]
    nb_max = jax.lax.reduce_window(dog, -jnp.inf, jax.lax.max, (3, 3, 3), (1, 1, 1), pads)
    nb_min = jax.lax.reduce_window(dog, jnp.inf, jax.lax.min, (3, 3, 3), (1, 1, 1), pads)
    is_max = (inner >= nb_max) & (inner > 0.8 * thresh_dog)
    is_min = (inner <= nb_min) & (inner < -0.8 * thresh_dog)
    is_ext = is_max | is_min
    # exclude the 1-px border (roll wraps around)
    border = jnp.zeros((H, W), dtype=bool).at[1:-1, 1:-1].set(True)
    is_ext = is_ext & border[None]

    resp = jnp.where(is_ext, jnp.abs(inner), 0.0)
    flat = resp.reshape(-1)
    k = min(max_kp, flat.shape[0])
    if jax.default_backend() == "tpu" and flat.shape[0] > (1 << 20):
        # exact top_k sorts the whole octave (48M elements on a 4000x4000
        # first octave); the TPU-optimized partial-reduction variant keeps
        # >= 95% of the strongest responses at a fraction of the cost, and
        # extrema are sparse enough that the slot cap rarely binds anyway
        vals, idx = jax.lax.approx_max_k(flat, k, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(flat, k)
    valid = vals > 0.0
    s_idx = idx // (H * W)  # 0..n_spo-1, maps to dog level s_idx+1
    rem = idx % (H * W)
    yy = rem // W
    xx = rem % W

    # quadratic refinement: gradient and Hessian of the DoG at (s, y, x)
    # via 27 batched one-element-per-keypoint gathers. (A vmapped (3,3,3)
    # dynamic_slice variant was tried and is ~2x SLOWER on the TPU: many
    # tiny slices cost a fixed DMA setup each, while the flat-index
    # gathers vectorize.)
    def at(ds, dy, dx):
        return dog[s_idx + 1 + ds, yy + dy, xx + dx]

    v = at(0, 0, 0)
    gx = 0.5 * (at(0, 0, 1) - at(0, 0, -1))
    gy = 0.5 * (at(0, 1, 0) - at(0, -1, 0))
    gs = 0.5 * (at(1, 0, 0) - at(-1, 0, 0))
    hxx = at(0, 0, 1) + at(0, 0, -1) - 2 * v
    hyy = at(0, 1, 0) + at(0, -1, 0) - 2 * v
    hss = at(1, 0, 0) + at(-1, 0, 0) - 2 * v
    hxy = 0.25 * (at(0, 1, 1) - at(0, 1, -1) - at(0, -1, 1) + at(0, -1, -1))
    hxs = 0.25 * (at(1, 0, 1) - at(1, 0, -1) - at(-1, 0, 1) + at(-1, 0, -1))
    hys = 0.25 * (at(1, 1, 0) - at(1, -1, 0) - at(-1, 1, 0) + at(-1, -1, 0))

    Hm = jnp.stack(
        [
            jnp.stack([hxx, hxy, hxs], axis=-1),
            jnp.stack([hxy, hyy, hys], axis=-1),
            jnp.stack([hxs, hys, hss], axis=-1),
        ],
        axis=-2,
    )  # (K, 3, 3)
    g = jnp.stack([gx, gy, gs], axis=-1)  # (K, 3)
    # solve H off = -g via the closed-form 3x3 inverse (stays f32; TPU XLA
    # has no f64 LU, and jnp.eye defaults would upcast under x64)
    from sat_bundleadjust_tpu.ops.lm import _inv3x3

    det = (
        Hm[:, 0, 0] * (Hm[:, 1, 1] * Hm[:, 2, 2] - Hm[:, 1, 2] * Hm[:, 2, 1])
        - Hm[:, 0, 1] * (Hm[:, 1, 0] * Hm[:, 2, 2] - Hm[:, 1, 2] * Hm[:, 2, 0])
        + Hm[:, 0, 2] * (Hm[:, 1, 0] * Hm[:, 2, 1] - Hm[:, 1, 1] * Hm[:, 2, 0])
    )
    eye = jnp.eye(3, dtype=Hm.dtype)
    Hm_safe = jnp.where(jnp.abs(det)[:, None, None] < 1e-12, eye, Hm)
    off = -jnp.einsum("kij,kj->ki", _inv3x3(Hm_safe), g)
    off = jnp.clip(off, -1.5, 1.5)
    refined_ok = jnp.max(jnp.abs(off), axis=-1) < 1.5

    # interpolated contrast
    v_hat = v + 0.5 * jnp.sum(g * off, axis=-1)
    contrast_ok = jnp.abs(v_hat) > thresh_dog

    # edge response on the 2x2 spatial Hessian
    tr = hxx + hyy
    det2 = hxx * hyy - hxy * hxy
    edge_ok = (det2 > 0) & (tr ** 2 / jnp.where(det2 == 0, 1e-30, det2) < (C_EDGE + 1) ** 2 / C_EDGE)

    valid = valid & refined_ok & contrast_ok & edge_ok
    return {
        "x": xx + off[:, 0],
        "y": yy + off[:, 1],
        "s": s_idx.astype(jnp.float32) + 1.0 + off[:, 2],  # dog level coordinate
        "value": v_hat,
        "valid": valid,
    }


# integer patch radius (octave px) for orientation/descriptor accumulation.
# Covers the descriptor window radius lambda_descr*(1+1/n)*sqrt(2)*sigma
# (= 10.6 sigma) and the orientation window 3*lambda_ori*sigma (= 4.5 sigma)
# for every octave-level sigma (refined sigma_oct <= ~1.9; the faint
# window tail beyond the patch at the very largest sigmas carries
# near-zero Gaussian weight).
_PATCH_R = 20


def _orientation_and_descriptor(ss, kp_x, kp_y, kp_sigma_oct, kp_level, valid):
    """Per-keypoint principal orientation + 128-dim descriptor.

    ss: (S, H, W) scale-space images of the octave; kp_level: int (S
    index) of the nearest level.

    IPOL-style integer-pixel accumulation over ONE contiguous per-keypoint
    patch: a (2R+3)^2 window is extracted ONCE per keypoint (one XLA
    gather of contiguous slices), gradients are central diffs inside the
    patch, and both histograms are weighted reductions over the patch
    pixels — shared between the orientation pass and BOTH descriptor
    orientations. This replaces per-sample bilinear gathers (~7.6k random
    single-element loads per keypoint — measured 1.7 s/frame at 2000x2000;
    the patch path is two orders of magnitude less gather traffic and
    matches the reference's per-pixel accumulation semantics more closely
    (LibSift.cpp orientation/descriptor loops)."""
    S_lv, H_im, W_im = ss.shape
    flat = ss.reshape(S_lv * H_im, W_im)
    # patch side incl. 1-px halo for central diffs, shrunk on the top
    # octaves whose whole image is smaller than the nominal patch
    P = min(2 * _PATCH_R + 3, H_im, W_im)

    xc = jnp.round(kp_x).astype(jnp.int32)
    yc = jnp.round(kp_y).astype(jnp.int32)
    x0 = jnp.clip(xc - _PATCH_R - 1, 0, W_im - P)
    y0 = jnp.clip(yc - _PATCH_R - 1, 0, H_im - P)
    rows = kp_level * H_im + y0
    # vmapped dynamic_slice -> one XLA gather of contiguous (P, P) slices.
    # Measured at ~3 us/keypoint on the TPU even with fully scattered
    # addresses — a Pallas per-keypoint DMA variant was prototyped and
    # brings no headroom (and Mosaic's (8,128) HBM slice alignment plus
    # missing dynamic-rotate lowering make it substantially more complex).
    patches = jax.vmap(
        lambda r0, c0: jax.lax.dynamic_slice(flat, (r0, c0), (P, P))
    )(rows, x0)  # (K, P, P)
    gx_all = 0.5 * (patches[:, 1:-1, 2:] - patches[:, 1:-1, :-2])
    gy_all = 0.5 * (patches[:, 2:, 1:-1] - patches[:, :-2, 1:-1])
    mag_all = jnp.hypot(gx_all, gy_all)
    ang_all = jnp.arctan2(gy_all, gx_all)  # [-pi, pi]
    # true offsets of the gradient pixels relative to the keypoint
    # (includes subpixel position and any border clamp shift)
    grid = jnp.arange(P - 2, dtype=jnp.float32)
    dx_all = (x0.astype(jnp.float32)[:, None] + 1.0 + grid[None]) - kp_x[:, None]
    dy_all = (y0.astype(jnp.float32)[:, None] + 1.0 + grid[None]) - kp_y[:, None]

    def orientation(mag, ang, dx, dy, sigma):
        d2 = dx[None, :] ** 2 + dy[:, None] ** 2
        win_sigma = LAMBDA_ORI * sigma
        w = jnp.exp(-d2 / (2 * win_sigma ** 2)) * (d2 <= (3 * win_sigma) ** 2)
        wm = (w * mag).reshape(-1)
        fbin = (ang.reshape(-1) + jnp.pi) / (2 * jnp.pi) * N_BINS
        bins = jnp.mod(jnp.floor(fbin), N_BINS)
        # nearest-bin histogram as 36 masked reductions (IPOL binning; a
        # one-hot matmul would materialize a (K, P^2, 36) operand)
        hist = jnp.stack(
            [jnp.sum(wm * (bins == b)) for b in range(N_BINS)]
        )
        # circular smoothing (6 box passes, IPOL style)
        for _ in range(6):
            hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0

        def peak_theta(b):
            # parabolic peak interpolation around bin b
            hm = hist[(b - 1) % N_BINS]
            h0 = hist[b]
            hp = hist[(b + 1) % N_BINS]
            denom = hm - 2 * h0 + hp
            delta = jnp.where(jnp.abs(denom) < 1e-12, 0.0, 0.5 * (hm - hp) / denom)
            return (b.astype(jnp.float32) + delta + 0.5) * (2 * jnp.pi / N_BINS) - jnp.pi

        b1 = jnp.argmax(hist)
        theta1 = peak_theta(b1)
        # secondary orientation: the best local maximum outside the
        # principal peak's immediate neighborhood, kept when >= 0.8 * max
        # (IPOL emits a keypoint per such peak; LibSift KeyPoint.cpp)
        ids = jnp.arange(N_BINS)
        circ_d = jnp.minimum(jnp.abs(ids - b1), N_BINS - jnp.abs(ids - b1))
        is_local_max = (hist >= jnp.roll(hist, 1)) & (hist >= jnp.roll(hist, -1))
        cand = jnp.where((circ_d > 1) & is_local_max, hist, -1.0)
        b2 = jnp.argmax(cand)
        theta2 = peak_theta(b2)
        valid2 = cand[b2] >= 0.8 * hist[b1]
        return theta1, theta2, valid2

    # ---- descriptor: 4x4 spatial x 8 orientation histograms, accumulated
    # over the same per-keypoint patch (rotated into the descriptor frame)
    def descriptor(mag2d, ang2d, dx, dy, sigma, theta):
        radius = LAMBDA_DESCR * sigma * (N_HIST + 1.0) / N_HIST
        ct, st = jnp.cos(theta), jnp.sin(theta)
        ox = dx[None, :] + jnp.zeros_like(dy)[:, None]
        oy = dy[:, None] + jnp.zeros_like(dx)[None, :]
        # normalized rotated coordinates (u, v) in [-1, 1] over the window
        us = (ct * ox + st * oy) / radius
        vs = (-st * ox + ct * oy) / radius
        us, vs = us.reshape(-1), vs.reshape(-1)
        mag = mag2d.reshape(-1)
        ang = ang2d.reshape(-1) - theta
        # gaussian weight exp(-d^2 / (2 (lambda_descr sigma)^2)) with
        # d^2 = radius^2 (u^2 + v^2) and radius = lambda sigma (n+1)/n
        ratio2 = ((N_HIST + 1.0) / N_HIST) ** 2
        w = jnp.exp(-(us ** 2 + vs ** 2) * ratio2 / 2.0)
        # normalized histogram coordinates in [0, N_HIST)
        hx = (us + 1.0) / 2.0 * N_HIST - 0.5
        hy = (vs + 1.0) / 2.0 * N_HIST - 0.5
        ho = jnp.mod(ang / (2 * jnp.pi) * N_ORI, N_ORI)
        # trilinear soft-binning as separable hat-weight contractions: the
        # bilinear weight of sample s in spatial bin a is max(0, 1-|h-a|),
        # and circularly for orientation bins — turning the scatter into a
        # small dense (S, bins) matmul chain that XLA maps onto the MXU
        bins4 = jnp.arange(N_HIST, dtype=jnp.float32)
        bins8 = jnp.arange(N_ORI, dtype=jnp.float32)
        Wx = jnp.maximum(0.0, 1.0 - jnp.abs(hx[:, None] - bins4[None, :]))  # (S, 4)
        Wy = jnp.maximum(0.0, 1.0 - jnp.abs(hy[:, None] - bins4[None, :]))  # (S, 4)
        do_ = jnp.abs(ho[:, None] - bins8[None, :])
        Wo = jnp.maximum(0.0, 1.0 - jnp.minimum(do_, N_ORI - do_))  # (S, 8) circular
        m = w * mag  # (S,)
        Wyx = Wy[:, :, None] * Wx[:, None, :]  # (S, 4, 4)
        desc = jnp.einsum(
            "sp,so->po", (m[:, None] * Wyx.reshape(-1, N_HIST * N_HIST)), Wo,
            preferred_element_type=jnp.float32,
        ).reshape(N_HIST, N_HIST, N_ORI)
        d = desc.reshape(-1)
        # normalize, clip at 0.2, renormalize, quantize to 0..255 (IPOL)
        norm = jnp.linalg.norm(d) + 1e-12
        d = jnp.minimum(d / norm, 0.2)
        norm2 = jnp.linalg.norm(d) + 1e-12
        return jnp.minimum(jnp.floor(512.0 * d / norm2), 255.0)

    thetas, thetas2, valid2 = jax.vmap(orientation)(
        mag_all, ang_all, dx_all, dy_all, kp_sigma_oct
    )
    descs = jax.vmap(descriptor)(mag_all, ang_all, dx_all, dy_all, kp_sigma_oct, thetas)
    descs2 = jax.vmap(descriptor)(mag_all, ang_all, dx_all, dy_all, kp_sigma_oct, thetas2)
    return thetas, descs, thetas2, descs2, valid2 & valid


def _process_octave_impl(current, sig_inc, thresh_dog, n_scales, max_kp_per_octave):
    """One whole octave as a single compiled program: scale space -> DoG ->
    extrema + refinement -> orientations + descriptors -> next-octave seed.

    Compiled once per (H, W) shape; all downstream ops are fused by XLA."""
    ss_list = [current]
    for s in range(n_scales + 2):
        ss_list.append(_blur_dynamic(ss_list[-1], sig_inc[s], _MAX_BLUR_RADIUS))
    ss = jnp.stack(ss_list)
    dog = ss[1:] - ss[:-1]

    kp = _extrema_and_refine(dog, thresh_dog, max_kp_per_octave)

    sigma_oct = SIGMA_MIN / DELTA_MIN * 2 ** (kp["s"] / n_scales)
    level = jnp.clip(jnp.round(kp["s"]).astype(jnp.int32), 0, n_scales + 2)
    thetas, descs, thetas2, descs2, valid2 = _orientation_and_descriptor(
        ss, kp["x"], kp["y"], sigma_oct, level, kp["valid"]
    )
    next_seed = _downsample2(ss[n_scales])
    return kp, (thetas, descs, thetas2, descs2, valid2), next_seed


_MAX_BLUR_RADIUS = 13  # 4-sigma support for the largest incremental blur (~3.1 octave px)


def _blur_dynamic(im, sigma, radius):
    """Separable Gaussian blur with a fixed (static) kernel radius and a
    traced sigma — lets one compiled octave program handle all its
    incremental blurs. Slice-and-accumulate for the same TPU channel-
    padding reason as _blur (traced tap weights are fine: each weighted
    slice is an elementwise multiply-add)."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    k = k / jnp.sum(k)
    h, w = im.shape
    im_p = jnp.pad(im, ((radius, radius), (0, 0)), mode="edge")
    im = sum(k[t] * jax.lax.slice(im_p, (t, 0), (t + h, w)) for t in range(2 * radius + 1))
    im_p = jnp.pad(im, ((0, 0), (radius, radius)), mode="edge")
    return sum(k[t] * jax.lax.slice(im_p, (0, t), (h, t + w)) for t in range(2 * radius + 1))


def _total_slots(h, w, n_octaves, n_scales, max_kp_per_octave):
    """Host-side twin of the slot-budget loop in _detect_packed.single:
    total packed keypoint slots (incl. the 2x secondary orientations)."""
    H, W = 2 * h, 2 * w
    total = 0
    for _o in range(n_octaves):
        if H < 12 or W < 12:
            break
        total += int(min(max_kp_per_octave, max(192, (H * W) // 128)))
        H, W = (H + 1) // 2, (W + 1) // 2
    return 2 * total


@partial(jax.jit, static_argnames=("n_octaves", "n_scales", "max_kp_per_octave",
                                   "fetch_k"))
def _detect_packed(im, thresh_dog, n_octaves, n_scales, max_kp_per_octave,
                   fetch_k=None):
    """The FULL SIFT pyramid of a (B, H, W) image stack as one compiled
    program: seed upsample, every octave (scale space -> extrema ->
    orientation/descriptors), packed into (B, S, 4) f32 geometry
    (col, row, scale, theta), (B, S, 128) uint8 descriptors and a (B, S)
    valid mask. Descriptors are already 0..255-quantized (IPOL), so the
    uint8 cast is exact and shrinks the host fetch ~3.7x — measured 673 ms
    for the f32 (S, 132) layout at 2000x2000 over the tunnel, vs ~190 ms
    for the whole compiled pyramid."""
    sigma_extra = float(np.sqrt(max(SIGMA_MIN ** 2 - SIGMA_IN ** 2, 0.0)) / DELTA_MIN)
    # incremental blur sigmas in octave pixels — the octave's delta cancels,
    # so ONE host constant serves every octave
    sig_abs = np.array(
        [SIGMA_MIN / DELTA_MIN * 2 ** (s / n_scales) for s in range(n_scales + 3)]
    )
    sig_inc = jnp.asarray(
        np.sqrt(np.maximum(sig_abs[1:] ** 2 - sig_abs[:-1] ** 2, 0.0)), jnp.float32
    )

    def single(x):
        current = _blur(_upsample2(x), sigma_extra)
        delta = DELTA_MIN
        geom_parts, desc_parts, valid_parts = [], [], []
        for _o in range(n_octaves):
            H, W = current.shape
            if H < 12 or W < 12:
                break
            # keypoint slot capacity scaled to the octave area. 1/128 px:
            # measured DoG extrema density on textured frames reaches
            # ~1/130 px at thresh 0.0133 (the earlier 1/300 estimate
            # silently truncated half the mid-octave keypoints the
            # reference SIMD SIFT finds — caught by
            # tests/test_native_ref_parity.py). Megapixel octaves still
            # cap at max_kp_per_octave, so large-frame memory is unchanged.
            slots = int(min(max_kp_per_octave, max(192, (H * W) // 128)))
            kp, (th, de, th2, de2, v2), current = _process_octave_impl(
                current, sig_inc, thresh_dog, n_scales, slots
            )
            abs_sigma = delta / DELTA_MIN * SIGMA_MIN * (2.0 ** (kp["s"] / n_scales))
            col, row = kp["x"] * delta, kp["y"] * delta
            # secondary-orientation keypoints: same location/scale, second
            # histogram peak >= 0.8 max (IPOL emits these as extras)
            for theta, desc, vv in ((th, de, kp["valid"]), (th2, de2, v2)):
                geom_parts.append(
                    jnp.stack([col, row, abs_sigma, theta], axis=1)
                )
                desc_parts.append(desc.astype(jnp.uint8))
                valid_parts.append(vv)
            delta *= 2.0
        geom = jnp.concatenate(geom_parts, 0)
        desc = jnp.concatenate(desc_parts, 0)
        valid = jnp.concatenate(valid_parts, 0)
        if fetch_k is not None and fetch_k < geom.shape[0]:
            # device-side compaction: keep the top-k valid slots by scale
            # (the same criterion the host cap applies) so the tunnel
            # fetch shrinks from total_slots to the caller's max_kp
            score = jnp.where(valid, geom[:, 2], -1.0)
            _, sel = jax.lax.top_k(score, fetch_k)
            geom, desc, valid = geom[sel], desc[sel], valid[sel]
        return geom, desc, valid

    return jax.vmap(single)(im)


def _octave_slots(h, w, n_octaves, max_kp_per_octave):
    """Host-side list of per-octave keypoint slot capacities (the loop in
    _detect_packed.single / _pyramid_extrema.single, octave-0 shape
    2h x 2w)."""
    H, W = 2 * h, 2 * w
    slots = []
    for _o in range(n_octaves):
        if H < 12 or W < 12:
            break
        slots.append(int(min(max_kp_per_octave, max(192, (H * W) // 128))))
        H, W = (H + 1) // 2, (W + 1) // 2
    return slots


@partial(jax.jit, static_argnames=("n_octaves", "n_scales", "max_kp_per_octave"))
def _pyramid_extrema(im, thresh_dog, n_octaves, n_scales, max_kp_per_octave):
    """Phase A of the content-adaptive detector: pyramid + DoG extrema +
    refinement ONLY (no descriptors). Returns a per-octave tuple of
    (scale-space stack, kp dict) — all device-resident — plus a tiny
    (B, n_oct) int32 valid-count array, the only thing the host fetches
    between phases."""
    sigma_extra = float(np.sqrt(max(SIGMA_MIN ** 2 - SIGMA_IN ** 2, 0.0)) / DELTA_MIN)
    sig_abs = np.array(
        [SIGMA_MIN / DELTA_MIN * 2 ** (s / n_scales) for s in range(n_scales + 3)]
    )
    sig_inc = jnp.asarray(
        np.sqrt(np.maximum(sig_abs[1:] ** 2 - sig_abs[:-1] ** 2, 0.0)), jnp.float32
    )

    def single(x):
        current = _blur(_upsample2(x), sigma_extra)
        octs, counts = [], []
        for _o in range(n_octaves):
            H, W = current.shape
            if H < 12 or W < 12:
                break
            slots = int(min(max_kp_per_octave, max(192, (H * W) // 128)))
            ss_list = [current]
            for s in range(n_scales + 2):
                ss_list.append(_blur_dynamic(ss_list[-1], sig_inc[s], _MAX_BLUR_RADIUS))
            ss = jnp.stack(ss_list)
            dog = ss[1:] - ss[:-1]
            kp = _extrema_and_refine(dog, thresh_dog, slots)
            octs.append((ss, kp))
            counts.append(jnp.sum(kp["valid"].astype(jnp.int32)))
            current = _downsample2(ss[n_scales])
        return tuple(octs), jnp.stack(counts)

    return jax.vmap(single)(im)


@partial(jax.jit, static_argnames=("n_scales", "buckets", "fetch_k"))
def _describe_buckets(octs, buckets, n_scales, fetch_k=None):
    """Phase B: orientation + descriptors for only the top-`bucket` valid
    slots of each octave, ALL octaves in one compiled program, packed into
    the same (geometry, uint8 descriptors, valid) layout as _detect_packed.

    `buckets` is a static tuple (one power-of-two per octave, 0 = skip the
    octave entirely), so descriptor work scales with the frame's actual
    keypoint content instead of the worst-case slot budget."""

    def single(octs_single):
        geom_parts, desc_parts, valid_parts = [], [], []
        delta = DELTA_MIN
        for (ss, kp), bucket in zip(octs_single, buckets):
            if bucket > 0:
                slots = kp["x"].shape[0]
                if bucket < slots:
                    # phase-A slots are response-ordered; keep the first
                    # `bucket` VALID ones in that order (invalid slots sort
                    # last, so when count <= bucket the result is identical
                    # to the monolithic path)
                    score = jnp.where(
                        kp["valid"], jnp.arange(slots, 0, -1, dtype=jnp.int32), 0
                    )
                    _, sel = jax.lax.top_k(score, bucket)
                    kp = {k: v[sel] for k, v in kp.items()}
                sigma_oct = SIGMA_MIN / DELTA_MIN * 2 ** (kp["s"] / n_scales)
                level = jnp.clip(jnp.round(kp["s"]).astype(jnp.int32), 0, n_scales + 2)
                th, de, th2, de2, v2 = _orientation_and_descriptor(
                    ss, kp["x"], kp["y"], sigma_oct, level, kp["valid"]
                )
                abs_sigma = delta / DELTA_MIN * SIGMA_MIN * (2.0 ** (kp["s"] / n_scales))
                col, row = kp["x"] * delta, kp["y"] * delta
                for theta, desc, vv in ((th, de, kp["valid"]), (th2, de2, v2)):
                    geom_parts.append(jnp.stack([col, row, abs_sigma, theta], axis=1))
                    desc_parts.append(desc.astype(jnp.uint8))
                    valid_parts.append(vv)
            delta *= 2.0
        geom = jnp.concatenate(geom_parts, 0)
        desc = jnp.concatenate(desc_parts, 0)
        valid = jnp.concatenate(valid_parts, 0)
        if fetch_k is not None and fetch_k < geom.shape[0]:
            score = jnp.where(valid, geom[:, 2], -1.0)
            _, sel = jax.lax.top_k(score, fetch_k)
            geom, desc, valid = geom[sel], desc[sel], valid[sel]
        return geom, desc, valid

    return jax.vmap(single)(octs)


def _next_bucket(count, slots):
    """Quantize a valid-count to a power-of-two bucket (floor 64, capped at
    the octave's slot budget) so compile variants stay bounded."""
    if count <= 0:
        return 0
    b = 64
    while b < count:
        b *= 2
    return min(b, slots)


def _use_adaptive():
    """Content-adaptive (two-phase) detection: default ON for CPU, OFF for
    accelerators. Rationale: the second phase costs one extra host sync
    (count fetch) and one extra dispatch — trivial locally, but on the
    tunneled-TPU deployment every new bucket profile is a new remotely
    compiled program (minutes each), so the single monolithic program
    stays the accelerator default until measured there.
    SATBA_SIFT_ADAPTIVE=1/0 overrides."""
    import os

    env = os.environ.get("SATBA_SIFT_ADAPTIVE")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() == "cpu"


def detect_sift(image, thresh_dog=0.0133, n_octaves=8, n_scales=3, max_kp=None,
                max_kp_per_octave=MAX_KP_PER_OCTAVE):
    """Full SIFT detection on a single grayscale image.

    Returns an (N, 132) numpy array (col, row, scale, orientation,
    descriptor) in the input image's pixel coordinates."""
    return detect_sift_batch(
        [image], thresh_dog=thresh_dog, n_octaves=n_octaves, n_scales=n_scales,
        max_kp=max_kp, max_kp_per_octave=max_kp_per_octave,
    )[0]


# images per compiled program on CPU: bounds scale-space working memory
# on 4-core test hosts; the chunk shrinks with image area so large frames
# keep the same program footprint (a 2000x2000 frame runs alone).
# (A round-2-era kernel crashed the tunneled v5e worker at 6 full 300x400
# frames per program; since the monolithic-pyramid rewrite, round 4
# measured 16 x 512^2 frames per program running fine on the same
# deployment — commit 017c6a3, config-#4 detection 167 -> 50 s — so the
# accelerator path in _auto_chunk uses the larger 16M-px budget while CPU
# keeps this conservative one.)
BATCH_CHUNK = 4
_CHUNK_PX = 4 * 300 * 400


def _auto_chunk(h, w):
    import jax

    if jax.default_backend() == "cpu":
        return max(1, min(BATCH_CHUNK, _CHUNK_PX // max(h * w, 1)))
    # accelerator: every chunk costs ~0.5 s of tunnel dispatch/fetch
    # protocol regardless of batch size, and the 512^2-frame config-#4
    # run paid it PER FRAME (chunk=1 under the CPU-sized pixel budget:
    # 167 s of detection for 100 frames). Batch as many frames as HBM
    # comfortably holds.
    return max(1, min(16, 16_000_000 // max(h * w, 1)))


def detect_sift_batch(images, thresh_dog=0.0133, n_octaves=8, n_scales=3,
                      max_kp=None, max_kp_per_octave=MAX_KP_PER_OCTAVE,
                      device_put_fn=None, batch_chunk=None):
    """SIFT detection over a list of SAME-SHAPE grayscale images.

    One vmapped octave program per octave shape serves a chunk of the
    stack: B images cost 8 device dispatches per chunk instead of 8 each,
    and the small upper octaves batch into better-utilized kernels.

    device_put_fn/batch_chunk: mesh hooks (parallel/feature_shard.py) —
    placing the stacked batch with a sharded leading axis lets XLA
    partition the vmapped octave programs across devices (the TPU-native
    analog of the reference's multiprocessing detection fan-out,
    ft_s2p.py:97-124).

    Returns a list of (N_i, 132) numpy arrays."""
    if batch_chunk is None:
        h0, w0 = np.asarray(images[0]).shape[:2]
        chunk = _auto_chunk(int(h0), int(w0))
    else:
        chunk = batch_chunk
    if len(images) > chunk:
        out = []
        for s in range(0, len(images), chunk):
            out.extend(detect_sift_batch(
                images[s : s + chunk], thresh_dog=thresh_dog,
                n_octaves=n_octaves, n_scales=n_scales, max_kp=max_kp,
                max_kp_per_octave=max_kp_per_octave,
                device_put_fn=device_put_fn, batch_chunk=batch_chunk,
            ))
        return out
    ims = []
    for image in images:
        image = np.asarray(image, dtype=np.float32)
        lo, hi = np.min(image), np.max(image)
        ims.append((image - lo) / max(hi - lo, 1e-12))
    im = np.stack(ims)  # (B, H, W)
    im = jnp.asarray(im) if device_put_fn is None else device_put_fn(im)

    # the WHOLE pyramid runs as one compiled program per (B, H, W) and the
    # packed (f32 geometry, uint8 descriptor, valid) result is fetched in
    # one device_get: per-octave programs cost a ~30 ms tunnel handshake
    # per dispatch (17 dispatches = ~0.5 s of pure protocol at 2000x2000),
    # a fetch of the raw per-octave pytree is ~100 leaves at one round trip
    # each, and an f32 (S, 132) layout is ~3.7x the bytes of this one
    # (673 ms vs the ~190 ms compiled pyramid at 2000x2000)
    if _use_adaptive():
        # content-adaptive two-phase path: extrema counts are fetched
        # between the pyramid and descriptor programs, and descriptor work
        # is sized to the frame's actual keypoint content (power-of-two
        # buckets per octave) instead of the worst-case slot budget —
        # measured 1.12 s -> 0.35 s per 300x400 frame on the 4-core CPU
        octs, counts = _pyramid_extrema(
            im, jnp.float32(thresh_dog), n_octaves, n_scales, max_kp_per_octave
        )
        counts = np.asarray(jax.device_get(counts)).max(axis=0)  # per octave
        h0, w0 = int(im.shape[1]), int(im.shape[2])
        slots = _octave_slots(h0, w0, n_octaves, max_kp_per_octave)
        buckets = tuple(
            _next_bucket(int(c), s) for c, s in zip(counts, slots)
        )
        if sum(buckets) == 0:  # no extrema anywhere in the batch
            return [np.zeros((0, 132)) for _ in images]
        fetch_k = None
        if max_kp is not None and max_kp < 2 * sum(buckets):
            fetch_k = int(max_kp)
        geom_all, desc_all, valid_all = jax.device_get(
            _describe_buckets(octs, buckets, n_scales, fetch_k=fetch_k)
        )
    else:
        fetch_k = None
        if max_kp is not None:
            h0, w0 = int(im.shape[1]), int(im.shape[2])
            if max_kp < _total_slots(h0, w0, n_octaves, n_scales, max_kp_per_octave):
                fetch_k = int(max_kp)
        geom_all, desc_all, valid_all = jax.device_get(
            _detect_packed(
                im, jnp.float32(thresh_dog), n_octaves, n_scales, max_kp_per_octave,
                fetch_k=fetch_k,
            )
        )
    B = im.shape[0]
    out = []
    for b in range(B):
        v = valid_all[b]
        feats = np.concatenate(
            [geom_all[b][v], desc_all[b][v].astype(np.float32)], axis=1
        )
        if feats.shape[0] == 0:
            out.append(np.zeros((0, 132)))
            continue
        if max_kp is not None and feats.shape[0] > max_kp:
            feats = feats[np.argsort(-feats[:, 2], kind="stable")[:max_kp]]
        out.append(feats)
    return out
