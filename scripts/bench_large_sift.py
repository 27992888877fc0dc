"""Time 2000x2000 SIFT detection on the attached device.

Measures wall/frame post-compile for the monolithic descriptor program
(SATBA_SIFT_ADAPTIVE=0, default on TPU) and, with SATBA_SIFT_ADAPTIVE=1,
the two-phase content-adaptive path (counts fetch + power-of-two
descriptor buckets). Timing includes the host fetch of the packed
feature arrays — that is the number a pipeline user sees.

Usage:
    python scripts/bench_large_sift.py            # monolithic
    SATBA_SIFT_ADAPTIVE=1 python scripts/bench_large_sift.py
    SATBA_BENCH_N=2000 SATBA_BENCH_REPEATS=5 ...
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()


def main():
    n = int(os.environ.get("SATBA_BENCH_N", "2000"))
    repeats = int(os.environ.get("SATBA_BENCH_REPEATS", "5"))
    from scipy.ndimage import gaussian_filter

    from sat_bundleadjust_tpu.ops.sift import detect_sift_batch

    rng = np.random.RandomState(0)
    im = gaussian_filter(rng.randn(n, n), 3.0)
    im += 0.3 * gaussian_filter(rng.randn(n, n), 12.0)
    im = (im / np.abs(im).max()).astype(np.float32)

    import jax

    platform = jax.devices()[0].platform
    adaptive = os.environ.get("SATBA_SIFT_ADAPTIVE", "(default)")

    t0 = time.time()
    feats = detect_sift_batch([im], max_kp=20000)
    print(
        "first call (compile): {:.1f}s, {} keypoints".format(
            time.time() - t0, feats[0].shape[0]
        ),
        flush=True,
    )

    walls = []
    for r in range(repeats):
        # vary the frame so per-frame keypoint counts differ (exercises
        # bucket reuse on the adaptive path) while shapes stay static
        im_r = np.roll(im, 13 * (r + 1), axis=0)
        t0 = time.time()
        feats = detect_sift_batch([im_r], max_kp=20000)
        walls.append(time.time() - t0)
    walls = np.array(walls)
    print(
        "{}x{} {} adaptive={}: wall/frame min {:.3f}s / median {:.3f}s / "
        "max {:.3f}s over {} ({} kp last frame)".format(
            n, n, platform, adaptive, walls.min(), np.median(walls),
            walls.max(), repeats, feats[0].shape[0],
        )
    )


if __name__ == "__main__":
    main()
