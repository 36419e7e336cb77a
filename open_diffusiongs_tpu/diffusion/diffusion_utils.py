"""Diffusion likelihood utilities (reference models/diffusion/diffusion_utils.py).

KL between diagonal Gaussians, the tanh-approximated standard normal CDF,
and the discretized Gaussian log-likelihood used for VLB terms
(diffusion_utils.py:10-104).  The shipped training path is pure MSE, so
these are parity/aux (used by LEARNED_RANGE-style variance objectives).
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL(N(mean1, exp(logvar1)) || N(mean2, exp(logvar2))) elementwise
    (diffusion_utils.py:10-37)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def approx_standard_normal_cdf(x):
    """Tanh approximation of Phi(x) (diffusion_utils.py:40-46)."""
    return 0.5 * (1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi)
                                 * (x + 0.044715 * x ** 3)))


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to [-1, 1] in 1/127.5 bins
    (diffusion_utils.py:78-104).  x in [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999, log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.clip(cdf_delta, 1e-12))))
