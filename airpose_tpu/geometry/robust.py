"""Robustifiers for optimization losses."""

import jax.numpy as jnp


def geman_mcclure(residual: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman–McClure robust penalty rho(r) = (r² · σ²) / (r² + σ²).

    Used by the AirPose+ bundle adjustment on 2D reprojection residuals with
    sigma=30 px (ref copenet_real_data/scripts/bundle_adj.py:134-136).
    """
    sq = residual * residual
    s2 = sigma * sigma
    return sq * s2 / (sq + s2)
