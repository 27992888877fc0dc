"""Worker for the 2-process FULL-pipeline test (tests/test_multihost.py).

Run as:
    python _multihost_pipeline_worker.py <process_id> <num_processes> \
        <coordinator> <config.json>
Every process runs the complete Scene pipeline on the SAME shared-directory
scene: per-host detection/matching IO (tracks/detection.py,
tracks/matching.py partition work by process and exchange through the npy
caches), the BA rounds solve on the cross-process global mesh
(pipeline._run_ba -> parallel/dist_solver), and process 0 writes the
outputs.
"""

import os
import sys

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
coord = sys.argv[3]
cfg_path = sys.argv[4]

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from sat_bundleadjust_tpu.parallel import multihost

multihost.initialize(coordinator_address=coord, num_processes=nproc, process_id=proc_id)
assert jax.process_count() == nproc, jax.process_count()

from sat_bundleadjust_tpu.timeseries import Scene

scene = Scene(cfg_path)
scene.run_bundle_adjustment_for_RPC_refinement()
print("MULTIHOST_PIPELINE_DONE pid={}".format(proc_id), flush=True)
