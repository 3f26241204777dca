"""Pallas fused-skinning kernel: numerical parity with the jnp path
(interpret mode on CPU; the real-TPU run happens in bench/verify)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from airpose_tpu.bodymodel.pallas_lbs import skinning_pallas, skinning_reference


@pytest.mark.parametrize("V,B", [(333, 2), (1024, 3)])
def test_skinning_matches_reference(rng, V, B):
    J = 55
    w = rng.random((V, J)).astype(np.float32)
    w /= w.sum(1, keepdims=True)
    rel = rng.normal(size=(B, J, 4, 4)).astype(np.float32) * 0.3
    rel[:, :, 3] = [0, 0, 0, 1]
    p = rng.normal(size=(B, V, 3)).astype(np.float32)

    want = np.asarray(skinning_reference(jnp.asarray(w), jnp.asarray(rel), jnp.asarray(p)))
    got = np.asarray(
        skinning_pallas(jnp.asarray(w), jnp.asarray(rel), jnp.asarray(p), interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5)
