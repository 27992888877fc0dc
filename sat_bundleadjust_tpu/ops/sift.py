"""Scale-space SIFT keypoint detection as batched JAX computations.

TPU-native replacement of the reference's SIMD C++ detector
(3rdparty/sift/simd/LibSift/LibSift.cpp:143-173 — the IPOL "Anatomy of
SIFT" algorithm, Rey Otero & Delbracio, with Lebrun's SSE rewrite). Same
anatomy and parameters (Parameters.cpp:36-43, ft_s2p.py:42-44):

  delta_min 0.5, sigma_min 0.8, sigma_in 0.5, n_octaves 8, n_spo 3,
  C_DoG (thresh_dog) 0.0133, C_edge 10, lambda_ori 1.5, lambda_descr 6,
  n_bins 36, 4x4x8 descriptors quantized to 0..255.

Kernelization strategy (vs the per-pixel C++ loops):
  * Gaussian pyramid: separable depthwise convolutions (XLA fuses these
    into HBM-bandwidth-bound scans)
  * DoG extrema: 3x3x3 neighborhood max/min via shifted-window reductions
  * subpixel refinement: one batched 3x3 Newton step on the DoG quadric
    (the C++ re-interpolates up to 5 times when the offset leaves the
    pixel, LibSift KeyPoint.cpp; a single masked step changes keypoint
    positions by <0.05 px on valid detections)
  * orientation + descriptor: fixed-capacity gather patches, vmapped over
    keypoint slots — no data-dependent shapes anywhere.

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
    radius = max(1, int(np.ceil(4.0 * sigma)))
    x = np.arange(-radius, radius + 1)
    k = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return jnp.asarray(k / k.sum(), dtype=jnp.float32)


def _blur(im, sigma):
    """Separable Gaussian blur with edge padding (host-fixed kernel size)."""
    if sigma <= 0:
        return im
    k = _gaussian_kernel(sigma)
    r = (k.shape[0] - 1) // 2
    im_p = jnp.pad(im, ((r, r), (0, 0)), mode="edge")
    im = jax.lax.conv_general_dilated(
        im_p[None, None], k[None, None, :, None], (1, 1), "VALID"
    )[0, 0]
    im_p = jnp.pad(im, ((0, 0), (r, r)), mode="edge")
    return jax.lax.conv_general_dilated(
        im_p[None, None], k[None, None, None, :], (1, 1), "VALID"
    )[0, 0]


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

    # 3x3x3 neighborhood extrema via max-pooling on shifted slices
    def neigh_extreme(op, init):
        out = jnp.full_like(inner, init)
        for ds in (-1, 0, 1):
            sl = dog[1 + ds : S - 1 + ds]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if ds == 0 and dy == 0 and dx == 0:
                        continue
                    shifted = jnp.roll(sl, (-dy, -dx), axis=(1, 2))
                    out = op(out, shifted)
        return out

    nb_max = neigh_extreme(jnp.maximum, -jnp.inf)
    nb_min = neigh_extreme(jnp.minimum, jnp.inf)
    is_max = (inner > nb_max) & (inner > 0.8 * thresh_dog)
    is_min = (inner < nb_min) & (inner < -0.8 * thresh_dog)
    is_ext = is_max | is_min
    # exclude the 1-px border (roll wraps around)
    border = jnp.zeros((H, W), dtype=bool).at[1:-1, 1:-1].set(True)
    is_ext = is_ext & border[None]

    resp = jnp.where(is_ext, jnp.abs(inner), 0.0)
    flat = resp.reshape(-1)
    vals, idx = jax.lax.top_k(flat, min(max_kp, flat.shape[0]))
    valid = vals > 0.0
    s_idx = idx // (H * W)  # 0..n_spo-1, maps to dog level s_idx+1
    rem = idx % (H * W)
    yy = rem // W
    xx = rem % W

    # quadratic refinement: gradient and Hessian of the DoG at (s, y, x)
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


def _bilinear(im, x, y):
    """Bilinear sample of a 2-D image at float coords, clamped."""
    h, w = im.shape
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, h - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = im[y0, x0]
    v01 = im[y0, x0 + 1]
    v10 = im[y0 + 1, x0]
    v11 = im[y0 + 1, x0 + 1]
    return (1 - fy) * ((1 - fx) * v00 + fx * v01) + fy * ((1 - fx) * v10 + fx * v11)


def _bilinear_level(imf, x, y, level, H):
    """Bilinear sample from level `level` of a level-flattened (S*H, W)
    image stack. Folding the level into the row index keeps this a pure
    gather — `stack[level]` per keypoint is a dynamic-slice that XLA can
    fail to fuse under vmap (it materialized (B*K, 1, H, W) broadcasts on
    the batched path)."""
    w = imf.shape[1]
    x = jnp.clip(x, 0.0, w - 1.001)
    y = jnp.clip(y, 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    yb = y0 + level * H
    v00 = imf[yb, x0]
    v01 = imf[yb, x0 + 1]
    v10 = imf[yb + 1, x0]
    v11 = imf[yb + 1, x0 + 1]
    return (1 - fy) * ((1 - fx) * v00 + fx * v01) + fy * ((1 - fx) * v10 + fx * v11)


def _orientation_and_descriptor(grad_x, grad_y, kp_x, kp_y, kp_sigma_oct, kp_level, valid):
    """Per-keypoint principal orientation + 128-dim descriptor.

    grad_*: (S, H, W) gradients of the octave's scale-space images.
    kp_level: int (S index) of the nearest scale-space image.
    All vmapped over keypoints; patch sampling is gather-based."""
    S_lv, H_im, W_im = grad_x.shape
    gxf = grad_x.reshape(S_lv * H_im, W_im)
    gyf = grad_y.reshape(S_lv * H_im, W_im)

    # ---- orientation: 36-bin histogram over a 3*lambda_ori*sigma window,
    # sampled on a sigma-proportional 21x21 grid (the window is exactly
    # covered at every scale with ~4x fewer gathers than a fixed-radius
    # integer patch; sub-pixel positions are bilinearly interpolated)
    N_ORI_GRID = 21
    u1 = (np.arange(N_ORI_GRID) - (N_ORI_GRID - 1) / 2.0) / ((N_ORI_GRID - 1) / 2.0)
    gus, gvs = np.meshgrid(u1, u1)
    gus = jnp.asarray(gus.reshape(-1), dtype=jnp.float32)  # in [-1, 1]
    gvs = jnp.asarray(gvs.reshape(-1), dtype=jnp.float32)

    def orientation(kx, ky, sigma, level):
        win_radius = 3.0 * LAMBDA_ORI * sigma
        dxs = win_radius * gus
        dys = win_radius * gvs
        px = kx + dxs
        py = ky + dys
        gx = _bilinear_level(gxf, px, py, level, H_im)
        gy = _bilinear_level(gyf, px, py, level, H_im)
        mag = jnp.hypot(gx, gy)
        ang = jnp.arctan2(gy, gx)  # [-pi, pi]
        d2 = dxs ** 2 + dys ** 2
        win_sigma = LAMBDA_ORI * sigma
        w = jnp.exp(-d2 / (2 * win_sigma ** 2)) * (d2 <= (3 * win_sigma) ** 2)
        fbin = (ang + jnp.pi) / (2 * jnp.pi) * N_BINS
        # one-hot contraction instead of a scatter (XLA scatters serialize
        # on CPU and are slow on TPU); a (S, 36) matmul vectorizes cleanly
        # under the keypoint/image vmaps
        wm = w * mag
        bins = jnp.mod(jnp.floor(fbin), N_BINS)
        onehot = (bins[:, None] == jnp.arange(N_BINS, dtype=bins.dtype)[None, :])
        hist = wm @ onehot.astype(wm.dtype)
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

    # ---- descriptor: 4x4 spatial x 8 orientation histograms
    # sample an SxS grid in the rotated, scale-normalized frame
    SAMP = 16  # 4 samples per spatial bin
    us, vs = np.meshgrid(
        (np.arange(SAMP) + 0.5) / SAMP * 2 - 1.0, (np.arange(SAMP) + 0.5) / SAMP * 2 - 1.0
    )
    us = jnp.asarray(us.reshape(-1), dtype=jnp.float32)  # in [-1, 1]
    vs = jnp.asarray(vs.reshape(-1), dtype=jnp.float32)

    def descriptor(kx, ky, sigma, level, theta):
        radius = LAMBDA_DESCR * sigma * (N_HIST + 1.0) / N_HIST
        ct, st = jnp.cos(theta), jnp.sin(theta)
        # rotated sampling positions
        sx = radius * us
        sy = radius * vs
        px = kx + ct * sx - st * sy
        py = ky + st * sx + ct * sy
        gx = _bilinear_level(gxf, px, py, level, H_im)
        gy = _bilinear_level(gyf, px, py, level, H_im)
        mag = jnp.hypot(gx, gy)
        ang = jnp.arctan2(gy, gx) - theta
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

    thetas, thetas2, valid2 = jax.vmap(orientation)(kp_x, kp_y, kp_sigma_oct, kp_level)
    descs = jax.vmap(descriptor)(kp_x, kp_y, kp_sigma_oct, kp_level, thetas)
    descs2 = jax.vmap(descriptor)(kp_x, kp_y, kp_sigma_oct, kp_level, thetas2)
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

    # edge-clamped central differences: roll would wrap, so descriptor
    # patches near the image border would sample gradients from the
    # opposite edge (at the border this degrades to a one-sided half
    # gradient, the standard choice)
    ssp = jnp.pad(ss, ((0, 0), (1, 1), (1, 1)), mode="edge")
    gx = 0.5 * (ssp[:, 1:-1, 2:] - ssp[:, 1:-1, :-2])
    gy = 0.5 * (ssp[:, 2:, 1:-1] - ssp[:, :-2, 1:-1])

    sigma_oct = SIGMA_MIN / DELTA_MIN * 2 ** (kp["s"] / n_scales)
    level = jnp.clip(jnp.round(kp["s"]).astype(jnp.int32), 0, n_scales + 2)
    thetas, descs, thetas2, descs2, valid2 = _orientation_and_descriptor(
        gx, gy, kp["x"], kp["y"], sigma_oct, level, kp["valid"]
    )
    next_seed = _downsample2(ss[n_scales])
    return kp, (thetas, descs, thetas2, descs2, valid2), next_seed


_process_octave = partial(jax.jit, static_argnames=("n_scales", "max_kp_per_octave"))(
    _process_octave_impl
)


@partial(jax.jit, static_argnames=("n_scales", "max_kp_per_octave"))
def _process_octave_batch(current, sig_inc, thresh_dog, n_scales, max_kp_per_octave):
    """One octave over a (B, H, W) stack of same-shape images."""
    return jax.vmap(
        lambda c: _process_octave_impl(c, sig_inc, thresh_dog, n_scales, max_kp_per_octave)
    )(current)


_MAX_BLUR_RADIUS = 13  # 4-sigma support for the largest incremental blur (~3.1 octave px)


def _blur_dynamic(im, sigma, radius):
    """Separable Gaussian blur with a fixed (static) kernel radius and a
    traced sigma — lets one compiled octave program handle all its
    incremental blurs."""
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-(x ** 2) / (2.0 * sigma ** 2))
    k = k / jnp.sum(k)
    im_p = jnp.pad(im, ((radius, radius), (0, 0)), mode="edge")
    im = jax.lax.conv_general_dilated(
        im_p[None, None], k[None, None, :, None], (1, 1), "VALID"
    )[0, 0]
    im_p = jnp.pad(im, ((0, 0), (radius, radius)), mode="edge")
    return jax.lax.conv_general_dilated(
        im_p[None, None], k[None, None, None, :], (1, 1), "VALID"
    )[0, 0]


def detect_sift(image, thresh_dog=0.0133, n_octaves=8, n_scales=3, max_kp=None,
                max_kp_per_octave=MAX_KP_PER_OCTAVE):
    """Full SIFT detection on a single grayscale image.

    Returns an (N, 132) numpy array (col, row, scale, orientation,
    descriptor) in the input image's pixel coordinates."""
    return detect_sift_batch(
        [image], thresh_dog=thresh_dog, n_octaves=n_octaves, n_scales=n_scales,
        max_kp=max_kp, max_kp_per_octave=max_kp_per_octave,
    )[0]


# images per compiled program: bounds scale-space working memory. 6 full
# 300x400 images in one program crashed the tunneled v5e worker; 4 is safe
# with headroom (per-image first-octave footprint ~60 MB + XLA transients)
BATCH_CHUNK = 4


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
    chunk = BATCH_CHUNK if batch_chunk is None else batch_chunk
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
    B = im.shape[0]

    # seed: upsample to delta_min and reach sigma_min
    sigma_extra = np.sqrt(max(SIGMA_MIN ** 2 - SIGMA_IN ** 2, 0.0)) / DELTA_MIN
    seed = jax.jit(jax.vmap(lambda x: _blur(_upsample2(x), sigma_extra)))(im)

    results = []
    delta = DELTA_MIN
    current = seed
    for o in range(n_octaves):
        H, W = current.shape[1:]
        if H < 12 or W < 12:
            break
        # absolute sigmas of this octave's n_scales+3 images
        sig_abs = np.array(
            [delta / DELTA_MIN * SIGMA_MIN * 2 ** (s / n_scales) for s in range(n_scales + 3)]
        )
        sig_inc = np.sqrt(np.maximum(sig_abs[1:] ** 2 - sig_abs[:-1] ** 2, 0.0)) / delta

        # keypoint slot capacity scaled to the octave area: natural DoG
        # extrema density is well below 1/300 px, so this keeps the strongest
        # responses while bounding the orientation/descriptor gather work.
        # Depends only on (H, W) -> compilation cache stays shared across
        # images of the same size.
        slots = int(min(max_kp_per_octave, max(128, (H * W) // 300)))

        kp, (thetas, descs, thetas2, descs2, valid2), current = _process_octave_batch(
            current, jnp.asarray(sig_inc, dtype=jnp.float32),
            jnp.float32(thresh_dog), n_scales, slots,
        )

        # keep everything on device: forcing a host transfer here would
        # synchronize after every octave (each sync is a full round trip on
        # tunneled devices); with async dispatch all octave programs enqueue
        # back-to-back and one device_get at the end drains the results
        abs_sigma = delta / DELTA_MIN * SIGMA_MIN * (2.0 ** (kp["s"] / n_scales))
        results.append(
            {
                "col": kp["x"] * delta,
                "row": kp["y"] * delta,
                "scale": abs_sigma,
                "theta": thetas,
                "desc": descs,
                "valid": kp["valid"],
            }
        )
        # secondary-orientation keypoints (same location/scale, second
        # histogram peak >= 0.8 max — IPOL emits these as extra keypoints)
        results.append(
            {
                "col": kp["x"] * delta,
                "row": kp["y"] * delta,
                "scale": abs_sigma,
                "theta": thetas2,
                "desc": descs2,
                "valid": valid2,
            }
        )
        delta *= 2.0

    # assemble (single host synchronization for the whole batch)
    results = jax.device_get(results)
    out = []
    for b in range(B):
        rows = []
        for r in results:
            v = r["valid"][b]
            if not np.any(v):
                continue
            feats = np.concatenate(
                [
                    r["col"][b][v, None],
                    r["row"][b][v, None],
                    r["scale"][b][v, None],
                    r["theta"][b][v, None],
                    r["desc"][b][v],
                ],
                axis=1,
            )
            rows.append(feats)
        if not rows:
            out.append(np.zeros((0, 132)))
            continue
        feats = np.concatenate(rows, axis=0)
        if max_kp is not None and feats.shape[0] > max_kp:
            feats = feats[np.argsort(-feats[:, 2], kind="stable")[:max_kp]]
        out.append(feats)
    return out
