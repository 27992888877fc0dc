"""Command line interface.

Covers the reference's bundle_adjust/cli.py:12-69: a single positional
JSON config argument, optional --timeline listing, and stdout/stderr
redirection to <output_dir>/bundle_adjust.log unless --verbose."""

import argparse
import os
import sys


def main():
    parser = argparse.ArgumentParser(
        description="Bundle adjustment for RPC model refinement of satellite imagery (TPU-native)"
    )
    parser.add_argument("config", metavar="config.json", help="path to a json scene configuration file")
    parser.add_argument(
        "--timeline",
        action="store_true",
        help="print the timeline of the scene described by the config and exit",
    )
    parser.add_argument(
        "--verbose",
        action="store_true",
        help="print to stdout instead of redirecting to output_dir/bundle_adjust.log",
    )
    args = parser.parse_args()

    from sat_bundleadjust_tpu.utils.compile_cache import enable_persistent_cache
    from sat_bundleadjust_tpu.utils.io import load_dict_from_json

    enable_persistent_cache()
    # multi-host deployments: wire this process into the global JAX runtime
    # before any backend use (no-op unless SATBA_COORDINATOR /
    # SATBA_NUM_PROCESSES are set or a TPU pod is auto-detected); the scene
    # then runs the SAME script on every host and the `distributed` config
    # knob routes the solve over the global mesh (docs/CONFIG.md)
    from sat_bundleadjust_tpu.parallel import multihost

    multihost.initialize()
    cfg = load_dict_from_json(args.config)

    import sat_bundleadjust_tpu
    from sat_bundleadjust_tpu.timeseries import Scene

    if args.timeline:
        scene = Scene(args.config)
        scene.get_timeline_attributes(range(len(scene.timeline)), ["datetime", "n_images", "id"])
        return

    if not args.verbose:
        import jax

        out_dir = cfg["output_dir"]
        os.makedirs(out_dir, exist_ok=True)
        # one log per process (process 0 keeps the reference's name)
        pid = jax.process_index()
        log_name = "bundle_adjust.log" if pid == 0 else "bundle_adjust.p{}.log".format(pid)
        log_path = os.path.join(out_dir, log_name)
        print("Running bundle adjustment; log at {}".format(log_path))
        log_file = open(log_path, "w")
        sys.stdout = log_file
        sys.stderr = log_file

    scene = Scene(args.config)
    scene.run_bundle_adjustment_for_RPC_refinement()


if __name__ == "__main__":
    main()
