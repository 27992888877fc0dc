"""Robust loss functions with scipy.optimize.least_squares semantics.

The reference relies on scipy's `loss=` / `f_scale=` machinery
(ba_core.py:284-297, soft_l1 config at ba_pipeline.py:330). scipy defines
cost = 0.5 * sum(rho(f_i^2)) with rho scaled so that
rho(z) = f_scale^2 * rho0(z / f_scale^2). For IRLS-style LM we scale the
residuals and Jacobian by sqrt(rho0'(z)), the standard first-order
approximation (Triggs correction omitted, as scipy's TRF also only uses
first-order loss information for its scaling).
"""

import jax.numpy as jnp


def loss_scale(loss: str, r, f_scale: float):
    """Per-component IRLS weight sqrt(rho'(z)), z = (r/f_scale)^2.

    r: (..., 2) raw weighted residuals. Returns same-shape weights."""
    if loss == "linear":
        return jnp.ones_like(r)
    z = (r / f_scale) ** 2
    if loss == "soft_l1":
        # rho0(z) = 2 (sqrt(1+z) - 1); rho0'(z) = 1/sqrt(1+z)
        return (1.0 + z) ** -0.25
    if loss == "huber":
        # rho0(z) = z if z<=1 else 2 sqrt(z) - 1; rho0'(z) = min(1, z^-1/2)
        return jnp.minimum(1.0, z ** -0.25)
    if loss == "cauchy":
        # rho0(z) = ln(1+z); rho0'(z) = 1/(1+z)
        return (1.0 + z) ** -0.5
    if loss == "arctan":
        # rho0(z) = arctan(z); rho0'(z) = 1/(1+z^2)
        return (1.0 + z ** 2) ** -0.5
    raise ValueError("unknown loss {}".format(loss))


def loss_cost(loss: str, r, f_scale: float):
    """0.5 * sum rho(f^2), matching scipy's cost definition."""
    z = (r / f_scale) ** 2
    if loss == "linear":
        rho = z
    elif loss == "soft_l1":
        rho = 2.0 * (jnp.sqrt(1.0 + z) - 1.0)
    elif loss == "huber":
        rho = jnp.where(z <= 1.0, z, 2.0 * jnp.sqrt(jnp.maximum(z, 1.0)) - 1.0)
    elif loss == "cauchy":
        rho = jnp.log1p(z)
    elif loss == "arctan":
        rho = jnp.arctan(z)
    else:
        raise ValueError("unknown loss {}".format(loss))
    return 0.5 * (f_scale ** 2) * jnp.sum(rho)
