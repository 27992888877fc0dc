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


def test_pallas_batched_matches_single_pair():
    """The pair-batched kernel (one dispatch for all pairs) must reproduce
    the single-pair kernel per pair, including per-pair gating on/off."""
    from sat_bundleadjust_tpu.ops.pallas_match import pallas_2nn_batched

    B = 3
    probs = [_random_problem(seed=s) for s in range(B)]
    n1 = max(p[0].shape[0] for p in probs)
    n2 = max(p[1].shape[0] for p in probs)
    di = np.zeros((B, n1, 128), np.float32)
    dj = np.zeros((B, n2, 128), np.float32)
    li = np.zeros((B, n1, 3), np.float32)
    hj = np.zeros((B, n2, 3), np.float32)
    hj[:, :, 2] = 1.0
    vi = np.zeros((B, n1), np.float32)
    vj = np.zeros((B, n2), np.float32)
    thr = np.zeros(B, np.float32)
    singles = []
    for b, (d1, d2, p1, p2, v1, v2) in enumerate(probs):
        di[b, : len(d1)] = d1
        dj[b, : len(d2)] = d2
        vi[b, : len(d1)] = v1
        vj[b, : len(d2)] = v2
        hj[b, : len(d2), :2] = p2
        if b == 1:  # pair 1 gets a real epipolar gate
            li[b, : len(d1)] = np.stack(
                [np.zeros(len(d1)), np.ones(len(d1)), -p1[:, 1]], axis=1
            )
            thr[b] = 30.0
        else:
            li[b, : len(d1), 0] = 1.0
            thr[b] = 1e9
        sd1, sd2, sidx = pallas_2nn(
            jnp.asarray(di[b]), jnp.asarray(dj[b]), jnp.asarray(li[b]),
            jnp.asarray(hj[b]), jnp.asarray(vi[b]), jnp.asarray(vj[b]),
            float(thr[b]), interpret=True,
        )
        singles.append((np.asarray(sd1), np.asarray(sd2), np.asarray(sidx)))

    packed = np.asarray(pallas_2nn_batched(
        jnp.asarray(di), jnp.asarray(dj), jnp.asarray(li), jnp.asarray(hj),
        jnp.asarray(vi), jnp.asarray(vj), jnp.asarray(thr), interpret=True,
    ))
    assert packed.shape == (B, 3, n1)
    for b, (sd1, sd2, sidx) in enumerate(singles):
        np.testing.assert_allclose(packed[b, 0], sd1, rtol=1e-6)
        np.testing.assert_allclose(packed[b, 1], sd2, rtol=1e-6)
        np.testing.assert_array_equal(packed[b, 2].astype(np.int32), sidx)


def test_match_pairs_2nn_batched_cpu_fallback():
    """The batched orchestration helper must agree with per-pair
    match_descriptors_2nn on the CPU backend."""
    from sat_bundleadjust_tpu.ops.match import match_pairs_2nn_batched

    feats = []
    for s in range(2):
        d1, d2, p1, p2, v1, v2 = _random_problem(n1=120, n2=150, seed=10 + s)
        fi = np.hstack([p1, np.ones((len(d1), 2), np.float32), d1])
        fj = np.hstack([p2, np.ones((len(d2), 2), np.float32), d2])
        fi[~v1] = np.nan
        fj[~v2] = np.nan
        feats.append((fi, fj))
    out = match_pairs_2nn_batched(feats, [None, None], rel_thr=0.8)
    assert len(out) == 2
    for (fi, fj), (nn, acc) in zip(feats, out):
        nn_ref, acc_ref, _ = match_descriptors_2nn(
            jnp.asarray(fi[:, 4:]), jnp.asarray(fj[:, 4:]),
            jnp.asarray(fi[:, :2]), jnp.asarray(fj[:, :2]),
            jnp.asarray(~np.isnan(fi[:, 0])), jnp.asarray(~np.isnan(fj[:, 0])),
            F=None, rel_thr=0.8,
        )
        np.testing.assert_array_equal(np.asarray(acc), np.asarray(acc_ref))
        agree = np.asarray(nn)[np.asarray(acc)] == np.asarray(nn_ref)[np.asarray(acc)]
        assert np.all(agree)


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


def test_pallas_i8_matches_f32_on_integer_descriptors():
    """The int8-MXU batched kernel must be BIT-identical to the f32 kernel
    on integer-valued 0..255 descriptors (uint8 SIFT quantization), with
    the same 1e12 no-candidate sentinel."""
    import jax.numpy as jnp

    from sat_bundleadjust_tpu.ops.pallas_match import (
        pallas_2nn_batched, pallas_2nn_batched_i8,
    )

    rng = np.random.RandomState(4)
    B, n1, n2 = 2, 300, 500
    d_i = rng.randint(0, 256, (B, n1, 128)).astype(np.float32)
    d_j = rng.randint(0, 256, (B, n2, 128)).astype(np.float32)
    d_j[:, :60] = d_i[:, :60]  # exact correspondences
    li = np.zeros((B, n1, 3), np.float32)
    li[..., 0] = 1.0
    hj = np.concatenate(
        [rng.rand(B, n2, 2).astype(np.float32) * 400, np.ones((B, n2, 1), np.float32)],
        axis=2,
    )
    vi = np.ones((B, n1), np.float32)
    vj = np.ones((B, n2), np.float32)
    vi[:, -5:] = 0.0  # some invalid rows exercise the sentinel path
    vj[0, :] = np.where(rng.rand(n2) < 0.2, 0.0, vj[0, :])
    thr = np.array([1e9, 8.0], np.float32)  # pair 1 gates

    f32 = np.asarray(pallas_2nn_batched(
        jnp.asarray(d_i), jnp.asarray(d_j), jnp.asarray(li), jnp.asarray(hj),
        jnp.asarray(vi), jnp.asarray(vj), jnp.asarray(thr), interpret=True,
    ))
    i8 = np.asarray(pallas_2nn_batched_i8(
        jnp.asarray((d_i - 128.0).astype(np.int8)),
        jnp.asarray((d_j - 128.0).astype(np.int8)),
        jnp.asarray(li), jnp.asarray(hj),
        jnp.asarray(vi), jnp.asarray(vj), jnp.asarray(thr), interpret=True,
    ))
    np.testing.assert_array_equal(i8, f32)


def test_match_pairs_2nn_staged_matches_host_packed():
    """Round-5 staged matcher (frames staged on device once, pair
    operands gathered on-device) must reproduce the host-packed batched
    path's (nn, accepted) results — integer-descriptor frames, epipolar
    gate on for some pairs, UTM-bbox row subsets."""
    from sat_bundleadjust_tpu.ops.match import (
        match_pairs_2nn_batched,
        match_pairs_2nn_staged,
        stage_frames_for_matching,
    )

    rng = np.random.RandomState(3)
    frames = []
    for k in (500, 650, 380):
        f = np.zeros((k, 132), np.float32)
        f[:, :2] = rng.rand(k, 2) * 400
        f[:, 2] = 1.0 + rng.rand(k)
        f[:, 4:] = rng.randint(0, 256, size=(k, 128)).astype(np.float32)
        frames.append(f)
    # overlapping descriptor content between frames 0/1 and 1/2
    frames[1][:200, 4:] = frames[0][:200, 4:]
    frames[2][:150, 4:] = frames[1][100:250, 4:]

    pair_frames = [(0, 1), (1, 2), (0, 2)]
    pair_idx = [
        (np.arange(0, 450), np.arange(0, 600)),
        (np.arange(50, 640), np.arange(0, 380)),
        (np.arange(0, 500), np.arange(10, 370)),
    ]
    Fs = [None,
          np.array([[0.0, 1e-4, -0.02], [-1e-4, 0.0, 0.03], [0.02, -0.03, 1.0]],
                   np.float32),
          None]

    staged = stage_frames_for_matching(frames)
    assert staged is not None
    got = match_pairs_2nn_staged(
        staged, pair_frames, pair_idx, Fs, rel_thr=0.8, interpret=True)

    # oracle: the SAME pallas kernel fed host-packed operands (the lax
    # matcher behind match_pairs_2nn_batched on CPU uses a two-sided
    # epipolar gate, so it is not the comparison target here)
    from sat_bundleadjust_tpu.ops.match import accept_from_packed, pack_pairs
    from sat_bundleadjust_tpu.ops.pallas_match import pallas_2nn_batched_i8

    pair_feats = [
        (frames[i][pi], frames[j][pj])
        for (i, j), (pi, pj) in zip(pair_frames, pair_idx)
    ]
    p = pack_pairs(pair_feats, Fs)
    packed = pallas_2nn_batched_i8(
        jnp.asarray((p["di"] - 128.0).astype(np.int8)),
        jnp.asarray((p["dj"] - 128.0).astype(np.int8)),
        jnp.asarray(p["li"]), jnp.asarray(p["hj"]),
        jnp.asarray(p["vi"]), jnp.asarray(p["vj"]), jnp.asarray(p["thr"]),
        interpret=True,
    )
    want = accept_from_packed(np.asarray(packed), pair_feats, p["vi"],
                              "relative", 0.8, 250.0)

    for (nn_g, acc_g), (nn_w, acc_w) in zip(got, want):
        assert np.array_equal(acc_g, acc_w)
        assert np.array_equal(nn_g[acc_g], nn_w[acc_w])


def test_stage_frames_declines_non_integer_descriptors():
    from sat_bundleadjust_tpu.ops.match import stage_frames_for_matching

    f = np.zeros((32, 132), np.float32)
    f[:, 4:] = 0.5  # not integer-valued
    assert stage_frames_for_matching([f]) is None
