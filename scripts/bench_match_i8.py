"""Time the f32 vs int8 Pallas 2-NN kernels on the real TPU.

Round-2 VERDICT weak #4: the uint8 SIFT descriptors were upcast to f32
in the matcher; the int8-MXU path (ops/pallas_match.pallas_2nn_batched_i8)
should buy up to ~4x on the cross-term matmul. This times both kernels on
identical integer-valued descriptors at reference-comparable sizes
(2k x 2k and 10k x 10k; the reference's own matcher measures 0.38-0.43 s
and 9.6-10.3 s there, scripts/bench_reference_native.py) and verifies the
results agree bit-for-bit.

Run on the TPU (do NOT force cpu): python scripts/bench_match_i8.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from sat_bundleadjust_tpu.ops.pallas_match import (
    pallas_2nn_batched, pallas_2nn_batched_i8,
)


def bench(n1, n2, B=1, repeats=5):
    rng = np.random.RandomState(0)
    di = rng.randint(0, 256, (B, n1, 128)).astype(np.float32)
    dj = rng.randint(0, 256, (B, n2, 128)).astype(np.float32)
    dj[:, : min(200, n2)] = di[:, : min(200, n2)]
    li = np.zeros((B, n1, 3), np.float32)
    li[..., 0] = 1.0
    hj = np.concatenate(
        [rng.rand(B, n2, 2).astype(np.float32) * 2000, np.ones((B, n2, 1), np.float32)],
        axis=2,
    )
    vi = np.ones((B, n1), np.float32)
    vj = np.ones((B, n2), np.float32)
    thr = np.full(B, 1e9, np.float32)

    args_f32 = [jnp.asarray(x) for x in (di, dj, li, hj, vi, vj, thr)]
    args_i8 = [jnp.asarray((di - 128.0).astype(np.int8)),
               jnp.asarray((dj - 128.0).astype(np.int8))] + args_f32[2:]

    out = {}
    for name, fn, args in (("f32", pallas_2nn_batched, args_f32),
                           ("i8", pallas_2nn_batched_i8, args_i8)):
        res = fn(*args)  # compile + warmup
        # time via a fetch of a 1-element slice (block_until_ready is
        # unreliable over the axon tunnel; scalar fetch forces completion)
        ts = []
        for _ in range(repeats):
            t0 = time.time()
            r = fn(*args)
            _ = np.asarray(r[0, 0, :1])
            ts.append(time.time() - t0)
        out[name] = (min(ts), sorted(ts)[len(ts) // 2], max(ts), np.asarray(res))
        print("  {}: min {:.3f} / med {:.3f} / max {:.3f} s".format(
            name, out[name][0], out[name][1], out[name][2]))
    same = np.array_equal(out["f32"][3], out["i8"][3])
    print("  bit-identical results: {}".format(same))
    print("  speedup (med f32 / med i8): {:.2f}x".format(out["f32"][1] / out["i8"][1]))
    return out


if __name__ == "__main__":
    print("backend:", jax.default_backend(), jax.devices())
    for n1, n2, B in [(2048, 2048, 1), (10240, 10240, 1), (3072, 3072, 15)]:
        print("B={} {}x{}:".format(B, n1, n2))
        bench(n1, n2, B)


def bench_big():
    # sizes where the kernel dominates the ~35 ms tunnel RTT
    for n1, n2, B in [(61440, 61440, 1), (10240, 10240, 12)]:
        print("B={} {}x{}:".format(B, n1, n2))
        bench(n1, n2, B, repeats=3)
