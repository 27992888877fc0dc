"""Device mesh helpers.

The reference's only parallelism is single-node multiprocessing over
images/pairs (SURVEY.md section 2.3). The TPU-native scaling axis is a
jax.sharding.Mesh: observations (tie-point blocks) are sharded over the
"obs" axis and reduced with psum over ICI; the embarrassingly parallel
feature stages shard over the same axis by image/pair."""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


OBS_AXIS = "obs"


def make_mesh(n_devices=None, devices=None):
    """1-D mesh over the available devices (axis name "obs")."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (OBS_AXIS,))


def replicated(mesh):
    return NamedSharding(mesh, P())


def sharded_leading(mesh):
    return NamedSharding(mesh, P(OBS_AXIS))
