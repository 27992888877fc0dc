"""Device placement policy for small host-side geometry computations.

The pipeline intersperses tiny geometry evaluations (5-corner footprints,
125-point virtual-match grids, 1000-point refit grids) between the hot
kernels. On a remote accelerator each of those would pay a separate
(minutes-long) compilation for milliseconds of work; they belong on the
host CPU device. The hot kernels (SIFT octaves, matching, LM solver,
full-scene triangulation) stay on the default backend.

Usage:
    with small_compute():            # always CPU
        ...jnp computation...
    with sized_compute(n_elements):  # CPU below the threshold
        ...
"""

import contextlib

SIZE_THRESHOLD = 200_000  # elements above which the accelerator pays off


def _cpu_device():
    import jax

    if jax.default_backend() == "cpu":
        return None
    try:
        return jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        return None


def small_compute():
    """Context manager placing computation on the host CPU device."""
    import jax

    dev = _cpu_device()
    return jax.default_device(dev) if dev is not None else contextlib.nullcontext()


def sized_compute(n_elements, threshold=SIZE_THRESHOLD):
    """CPU below the element threshold, default device above."""
    if n_elements >= threshold:
        return contextlib.nullcontext()
    return small_compute()
