"""Robust loss functions with scipy.optimize.least_squares semantics.

The reference relies on scipy's `loss=` / `f_scale=` machinery
(ba_core.py:284-297, soft_l1 config at ba_pipeline.py:330). scipy defines
cost = 0.5 * sum(rho(f_i^2)) with rho scaled so that
rho(z) = f_scale^2 * rho0(z / f_scale^2). For IRLS-style LM we scale the
residuals and Jacobian by sqrt(rho0'(z)), the standard first-order
approximation (Triggs correction omitted, as scipy's TRF also only uses
first-order loss information for its scaling).
"""

import jax
import jax.numpy as jnp

# Loss identity also exists as an integer id so the LM driver can take the
# loss as a TRACED operand (jax.lax.switch over the rho set) instead of a
# compile-time constant: the pipeline's soft-L1 round, outlier probe and
# final L2 round then share ONE compiled program per problem shape — on a
# remote/tunneled TPU each extra compilation costs tens of seconds.
LOSSES = ("linear", "soft_l1", "huber", "cauchy", "arctan")


def loss_id(loss: str) -> int:
    """Static loss name -> integer id for traced dispatch."""
    try:
        return LOSSES.index(loss)
    except ValueError:
        raise ValueError("unknown loss {}".format(loss))


# rho0'(z) and rho0(z) branch tables indexed by loss_id; z = (r/f_scale)^2
_SCALE_BRANCHES = (
    lambda z: jnp.ones_like(z),            # linear
    lambda z: (1.0 + z) ** -0.25,          # soft_l1: rho0' = 1/sqrt(1+z)
    lambda z: jnp.minimum(1.0, z ** -0.25),  # huber: rho0' = min(1, z^-1/2)
    lambda z: (1.0 + z) ** -0.5,           # cauchy: rho0' = 1/(1+z)
    lambda z: (1.0 + z ** 2) ** -0.5,      # arctan: rho0' = 1/(1+z^2)
)
_RHO_BRANCHES = (
    lambda z: z,
    lambda z: 2.0 * (jnp.sqrt(1.0 + z) - 1.0),
    lambda z: jnp.where(z <= 1.0, z, 2.0 * jnp.sqrt(jnp.maximum(z, 1.0)) - 1.0),
    lambda z: jnp.log1p(z),
    lambda z: jnp.arctan(z),
)


def loss_scale(loss, r, f_scale):
    """Per-component IRLS weight sqrt(rho'(z)), z = (r/f_scale)^2.

    r: (..., 2) raw weighted residuals. Returns same-shape weights.
    `loss` is a static name (str) or a traced integer id (loss_id)."""
    if isinstance(loss, str):
        if loss == "linear":
            return jnp.ones_like(r)
        return _SCALE_BRANCHES[loss_id(loss)]((r / f_scale) ** 2)
    return jax.lax.switch(loss, list(_SCALE_BRANCHES), (r / f_scale) ** 2)


def loss_cost(loss, r, f_scale):
    """0.5 * sum rho(f^2), matching scipy's cost definition.

    `loss` is a static name (str) or a traced integer id (loss_id)."""
    z = (r / f_scale) ** 2
    if isinstance(loss, str):
        rho = _RHO_BRANCHES[loss_id(loss)](z)
    else:
        rho = jax.lax.switch(loss, list(_RHO_BRANCHES), z)
    return 0.5 * (f_scale ** 2) * jnp.sum(rho)
