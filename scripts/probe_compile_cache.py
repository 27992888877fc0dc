"""Does the persistent compile cache HIT across processes on this deployment?

Round-3 scale runs paid full remote recompiles in every fresh process
(~240 s of 606 s at config #2) despite utils/compile_cache being enabled,
and the round-3 conclusion was "no cache across processes on the tunneled
setup". This probe settles it:

  * process A compiles a solver-shaped program with the cache on, records
    compile wall;
  * process B (fresh interpreter) runs the same program with
    jax_explain_cache_misses on and records compile wall;
  * a hit means B's compile is ~instant and no miss explanation prints.

Run:  python scripts/probe_compile_cache.py          (spawns the child)
      SATBA_PROBE_CHILD=1 python scripts/probe_compile_cache.py (child mode)
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_program(tag):
    from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache

    cache_dir = enable_persistent_cache()
    import jax

    try:
        jax.config.update("jax_explain_cache_misses", True)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from sat_bundleadjust_tpu.ba.solver import BASolver
    from sat_bundleadjust_tpu.utils.demo import make_scene_arrays, scene_to_baparams

    print("[{}] backend={} cache_dir={}".format(tag, jax.default_backend(), cache_dir),
          flush=True)

    # a solver-shaped program (LM while_loop, the expensive family)
    scene = make_scene_arrays(n_cam=12, n_pts=3000, obs_per_pt=4, seed=0)
    p = scene_to_baparams(scene, noise_pts=1.0)
    t0 = time.time()
    solver = BASolver(p, schur_mode="cg")
    solver.solve({"max_iter": 2})
    t_first = time.time() - t0
    print("[{}] first solve (build+compile+run): {:.1f} s".format(tag, t_first),
          flush=True)

    t0 = time.time()
    solver.solve({"max_iter": 2})
    t_warm = time.time() - t0
    print("[{}] warm solve (no compile): {:.2f} s".format(tag, t_warm), flush=True)
    return t_first, t_warm


def main():
    if os.environ.get("SATBA_PROBE_CHILD"):
        run_program("child")
        return

    t_parent = run_program("parent")
    print("--- spawning fresh process (same cache dir) ---", flush=True)
    env = dict(os.environ, SATBA_PROBE_CHILD="1")
    t0 = time.time()
    r = subprocess.run([sys.executable, os.path.abspath(__file__)], env=env,
                       capture_output=True, text=True, timeout=1800)
    print(r.stdout, flush=True)
    if r.returncode != 0:
        print(r.stderr[-3000:], flush=True)
        return
    # surface any cache-miss explanations the child logged
    misses = [l for l in r.stderr.splitlines() if "cache miss" in l.lower()]
    print("child cache-miss explanations: {}".format(len(misses)), flush=True)
    for l in misses[:10]:
        print("  " + l[:300], flush=True)
    print("child total wall: {:.1f} s (parent first-solve {:.1f} s)".format(
        time.time() - t0, t_parent[0]), flush=True)


if __name__ == "__main__":
    main()
