"""Profiling hooks.

The reference only prints wall-clock deltas per stage (SURVEY.md section
5.1). Here the same stage timers exist (pipeline prints), plus real device
tracing: set SATBA_PROFILE_DIR=/path and wrap any region in
`with device_trace("ba_solve"):` to capture a jax.profiler trace viewable
in TensorBoard/XProf (device kernels, HBM usage, fusion boundaries)."""

import contextlib
import os
import time


@contextlib.contextmanager
def device_trace(name):
    """jax.profiler trace of the enclosed region if SATBA_PROFILE_DIR is set."""
    trace_dir = os.environ.get("SATBA_PROFILE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    path = os.path.join(trace_dir, name)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield


@contextlib.contextmanager
def stage_timer(label, verbose=True):
    """Wall-clock stage timer matching the reference's print style."""
    t0 = time.time()
    yield
    if verbose:
        print("{} done in {:.2f} seconds".format(label, time.time() - t0), flush=True)
