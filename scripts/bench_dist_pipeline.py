"""Distributed PRODUCT pipeline at config-#4 shape on the virtual mesh.

Round-4 VERDICT weak #4: the end-to-end `distributed=true` pipeline had
only run at 4 cameras. This renders the 100-camera / 512^2 multi-date
scene (the shape the knob exists for) and runs the complete CLI pipeline
three ways, recording stage walls:

  single  — one CPU device (distributed=false)
  mesh8   — 8-virtual-device CPU mesh, one process (distributed=true)
  proc2   — 2 real jax.distributed processes x 4 virtual devices each,
            per-host detection/matching IO + cross-process BA mesh

Virtual devices share the 4 host cores, so mesh walls measure sharding
overhead (not chip scaling); what must hold is: same outputs, no stage
blowing up, the distributed program staying in the single-device run's
ballpark. Usage: python scripts/bench_dist_pipeline.py [out_root]
Scale knobs: SATBA_DP_CAMS (default 100 = 10 dates x 10), SATBA_DP_KP
(default 2000 — CPU lax matching at the full 5k cap costs ~0.6 s/pair).
"""

import json
import os
import re
import socket
import subprocess
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
# 8 virtual devices share 4 host cores: a partitioned detection program's
# slowest partition can exceed XLA:CPU's default 40 s collective
# rendezvous termination deadline (observed: AllGatherThunk killing the
# process mid-detection) — raise it, this is a correctness bench
_EXTRA_FLAGS = (" --xla_force_host_platform_device_count=8"
                " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + _EXTRA_FLAGS
    ).strip()

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))
sys.path.insert(0, HERE)


STAGES = [
    ("detection", r"\[tracks\] feature detection: ([\d.]+) s"),
    ("pairs", r"\[tracks\] pair selection: ([\d.]+) s"),
    ("matching", r"\[tracks\] matching: ([\d.]+) s"),
    ("trackbuild", r"\[tracks\] track building: ([\d.]+) s"),
    ("triangulation", r"Initializing 3d points.*?([\d.]+) s", ),
]


def stage_walls(text):
    out = {}
    for name, pat in STAGES:
        m = re.findall(pat, text, flags=re.S)
        if m:
            out[name] = float(m[-1])
    m = re.findall(r"Bundle adjustment pipeline completed in (\d+):(\d+):([\d.]+)", text)
    if m:
        h, mn, s = m[-1]
        out["pipeline_total"] = int(h) * 3600 + int(mn) * 60 + float(s)
    m = re.findall(r"\(([\d.]+), ([\d.]+)\)", text)
    if m:
        out["err_before"], out["err_after"] = map(float, m[-1])
    return out


def write_cfg(root, img_dir, name, distributed):
    out_dir = os.path.join(root, "out_" + name)
    cfg = {
        "geotiff_dir": img_dir, "rpc_dir": img_dir, "rpc_src": "txt",
        "cam_model": "rpc", "output_dir": out_dir, "ba_method": "ba_global",
        "n_dates": 1,
        "FT_kp_max": int(os.environ.get("SATBA_DP_KP", 2000)),
        "FT_sift_detection": "tpu", "FT_sift_matching": "epipolar_based",
        "clean_outliers": True, "save_figures": False,
        "distributed": distributed,
    }
    path = os.path.join(root, "config_{}.json".format(name))
    with open(path, "w") as f:
        json.dump(cfg, f)
    return path, out_dir


def run_inproc(cfg_path, n_devices=8):
    """Run the pipeline in a SUBPROCESS (clean device/mesh state per
    configuration) and return its stdout."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count={}"
        " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
    ).format(n_devices)
    p = subprocess.run(
        [sys.executable, "-c",
         "import sat_bundleadjust_tpu; sat_bundleadjust_tpu.main({!r})".format(cfg_path)],
        env=env, capture_output=True, text=True, cwd=os.path.dirname(HERE))
    sys.stderr.write(p.stderr[-2000:])
    if p.returncode != 0:
        print(p.stdout[-4000:])
        raise RuntimeError("pipeline failed")
    return p.stdout


def free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def run_two_process(cfg_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4"
                        " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
    for k in list(env):
        if "AXON" in k:
            env.pop(k)
    coord = "127.0.0.1:{}".format(free_port())
    worker = os.path.join(os.path.dirname(HERE), "tests",
                          "_multihost_pipeline_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", coord, cfg_path],
            env=env, text=True, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outs = [p.communicate()[0] for p in procs]
    for i, p in enumerate(procs):
        if p.returncode != 0:
            print(outs[i][-4000:])
            raise RuntimeError("worker {} failed".format(i))
    return outs[0]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/satba_dist_pipeline"
    os.makedirs(root, exist_ok=True)
    n_cams = int(os.environ.get("SATBA_DP_CAMS", 100))
    views = max(1, n_cams // 10)

    from run_scale_e2e import render_scene

    img_dir = os.path.join(root, "images")
    if not os.path.isdir(img_dir) or not os.listdir(img_dir):
        render_scene(root, n_dates=10, views_per_date=views, h=512, w=512)

    wanted = set(sys.argv[2:]) or {"single", "mesh8", "proc2"}
    results = {}
    for name, runner, dist in (
        ("single", lambda c: run_inproc(c, n_devices=1), False),
        ("mesh8", run_inproc, True),
        ("proc2", run_two_process, True),
    ):
        if name not in wanted:
            continue
        cfg_path, out_dir = write_cfg(root, img_dir, name, dist)
        t0 = time.time()
        out = runner(cfg_path)
        walls = stage_walls(out)
        walls["wall_total"] = time.time() - t0
        results[name] = walls
        print("{:8s} {}".format(name, json.dumps(walls)), flush=True)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
