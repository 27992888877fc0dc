"""sat_bundleadjust_tpu — a TPU-native satellite bundle adjustment framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
centreborelli/sat-bundleadjust (IPOL 2021, "A Generic Bundle Adjustment
Methodology for Indirect RPC Model Refinement of Satellite Imagery").

The pipeline refines Rational Polynomial Camera (RPC) models of satellite
images so they become mutually consistent:

    detect keypoints -> select stereo pairs -> match pairwise ->
    build multi-image feature tracks -> triangulate 3-D tie points ->
    bundle adjustment over per-camera corrective rotations ->
    reject outliers -> re-fit fresh RPC polynomials -> write .rpc_adj files

Compared with the reference (CPU, scipy TRF with finite-difference
Jacobians, C/C++ SIFT via ctypes), this framework is built TPU-first:

* geometry core: batched, differentiable RPC projection/localization and
  ECEF<->geodetic transforms as pure JAX (reference: c/rpc.c + rpcm)
* solver: explicit Levenberg-Marquardt with analytic block Jacobians and
  Schur-complement elimination of tie points (reference:
  bundle_adjust/ba_core.py:244 scipy least_squares)
* feature tracks: batched DoG/SIFT detection and MXU 2-NN matching kernels
  (reference: 3rdparty/sift SIMD C++ + sift4ctypes.cpp)
* scale-out: observation tables sharded over a jax.sharding.Mesh, camera
  normal system reduced with psum over ICI (reference: multiprocessing.Pool)

Precision: satellite geometry needs ~1e-9 relative accuracy (ECEF coords are
~6.4e6 m and the error budget is <0.05 px over ~1e3 px images), so the
geometry/solver core runs in float64 (emulated on TPU, still far faster than
the reference's per-point Python loops). Set SATBA_NO_X64=1 before import to
keep JAX in float32 (for experiments only).
"""

import os

import jax

if not os.environ.get("SATBA_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# Honor an explicit JAX_PLATFORMS env var even when a site hook (e.g. a
# PJRT plugin registration in sitecustomize) has force-updated the
# jax_platforms config after interpreter start.
_platforms_env = os.environ.get("JAX_PLATFORMS")
if _platforms_env:
    try:
        jax.config.update("jax_platforms", _platforms_env)
    except Exception:
        pass

__version__ = "0.1.0"

_LAZY_EXPORTS = {
    "BundleAdjustmentPipeline": ("sat_bundleadjust_tpu.pipeline", "BundleAdjustmentPipeline"),
    "Scene": ("sat_bundleadjust_tpu.timeseries", "Scene"),
    "RPCModel": ("sat_bundleadjust_tpu.models.rpc", "RPCModel"),
    "rpc_from_rpc_file": ("sat_bundleadjust_tpu.models.rpc", "rpc_from_rpc_file"),
    "SatelliteImage": ("sat_bundleadjust_tpu.models.cameras", "SatelliteImage"),
    "BAParams": ("sat_bundleadjust_tpu.ba.params", "BAParams"),
    "run_ba_optimization": ("sat_bundleadjust_tpu.ba.solver", "run_ba_optimization"),
}


def __getattr__(name):
    """Lazy top-level exports (importing the package stays light)."""
    if name in _LAZY_EXPORTS:
        import importlib

        module, attr = _LAZY_EXPORTS[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(name)


def main(config_path):
    """Run the full pipeline from a JSON config (reference: __init__.py:10-14)."""
    from sat_bundleadjust_tpu.timeseries import Scene

    scene = Scene(config_path)
    scene.run_bundle_adjustment_for_RPC_refinement()
    return scene
