"""Robustifiers for optimization losses."""

import jax.numpy as jnp


def geman_mcclure(residual: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Geman–McClure robust penalty rho(r) = r² / (r² + σ²), saturating at 1.

    Exactly the reference's gmcclure (ref
    copenet_real_data/scripts/bundle_adj.py:134-136) — keeping the same
    saturation scale matters because the AirPose+ prior weights (β ×2000,
    VPoser ×0.05, temporal ×1) were tuned against it.
    """
    sq = residual * residual
    return sq / (sq + sigma * sigma)
