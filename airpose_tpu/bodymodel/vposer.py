"""VPoser v2 (32-d latent VAE over 21-joint body pose) in JAX.

The reference uses the torch `human_body_prior` VPoser for the real-data
fine-tuning prior (`vp_model.encode(pose_aa_63).rsample()`,
ref copenet_real/copenet_twoview.py:125-136) and for AirPose+
(`vp_model.decode(z)["pose_body"]`, ref bundle_adj.py:178,306).

Architecture (VPoser v2):
  encode:  BN(63) → Linear(63,512) → LeakyReLU → BN(512) → Dropout(0.1)
           → Linear(512,512) → Linear(512,512) → {mu: Linear(512,32),
                                                  sigma: softplus(Linear(512,32))}
  decode:  Linear(32,512) → LeakyReLU → Dropout(0.1) → Linear(512,512)
           → LeakyReLU → Linear(512,126) → 6D→rotmat → axis-angle

Implemented as an explicit parameter pytree + pure functions (inference
semantics: BatchNorm running stats, no dropout — matching how the reference
uses the frozen prior). `convert_torch_state_dict` maps released torch
weights into this pytree.
"""

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.rotations import rot6d_to_rotmat, rotmat_to_aa

LATENT_DIM = 32
NUM_NEURONS = 512
NUM_FEATURES = 63  # 21 joints × 3 (axis-angle)


class Dense(NamedTuple):
    w: jnp.ndarray  # (in, out)
    b: jnp.ndarray  # (out,)


class BatchNorm(NamedTuple):
    scale: jnp.ndarray
    bias: jnp.ndarray
    mean: jnp.ndarray
    var: jnp.ndarray


class VPoserParams(NamedTuple):
    enc_bn0: BatchNorm
    enc_fc1: Dense
    enc_bn1: BatchNorm
    enc_fc2: Dense
    enc_fc3: Dense
    enc_mu: Dense
    enc_sigma: Dense
    dec_fc1: Dense
    dec_fc2: Dense
    dec_out: Dense


def _dense(x: jnp.ndarray, p: Dense) -> jnp.ndarray:
    return jnp.matmul(x, p.w) + p.b


def _bn(x: jnp.ndarray, p: BatchNorm, eps: float = 1e-5) -> jnp.ndarray:
    return (x - p.mean) * jax.lax.rsqrt(p.var + eps) * p.scale + p.bias


def _leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=0.01)


def vposer_encode(
    params: VPoserParams, pose_body_aa: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(B, 63) axis-angle body pose → Normal(mu, sigma) over the 32-d latent."""
    x = pose_body_aa.reshape(pose_body_aa.shape[0], NUM_FEATURES)
    x = _bn(x, params.enc_bn0)
    x = _leaky_relu(_dense(x, params.enc_fc1))
    x = _bn(x, params.enc_bn1)
    x = _dense(x, params.enc_fc2)
    x = _dense(x, params.enc_fc3)
    mu = _dense(x, params.enc_mu)
    sigma = jax.nn.softplus(_dense(x, params.enc_sigma))
    return mu, sigma


def vposer_rsample(mu: jnp.ndarray, sigma: jnp.ndarray, key) -> jnp.ndarray:
    """Reparameterized sample from the encoder distribution."""
    return mu + sigma * jax.random.normal(key, mu.shape, dtype=mu.dtype)


def vposer_decode(params: VPoserParams, z: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """(B, 32) latent → {'pose_body': (B, 21, 3) axis-angle,
    'pose_body_matrot': (B, 21, 3, 3)}."""
    x = _leaky_relu(_dense(z, params.dec_fc1))
    x = _leaky_relu(_dense(x, params.dec_fc2))
    six = _dense(x, params.dec_out).reshape(z.shape[0], 21, 6)
    rotmats = rot6d_to_rotmat(six)
    return {"pose_body": rotmat_to_aa(rotmats), "pose_body_matrot": rotmats}


def init_vposer_params(seed: int = 0, dtype=jnp.float32) -> VPoserParams:
    """Random init with torch-Linear-like scaling (for tests / training from
    scratch; released priors load via `convert_torch_state_dict`)."""
    rng = np.random.default_rng(seed)

    def dense(i, o):
        k = 1.0 / np.sqrt(i)
        return Dense(
            w=jnp.asarray(rng.uniform(-k, k, size=(i, o)), dtype=dtype),
            b=jnp.asarray(rng.uniform(-k, k, size=(o,)), dtype=dtype),
        )

    def bn(n):
        return BatchNorm(
            scale=jnp.ones((n,), dtype=dtype),
            bias=jnp.zeros((n,), dtype=dtype),
            mean=jnp.zeros((n,), dtype=dtype),
            var=jnp.ones((n,), dtype=dtype),
        )

    return VPoserParams(
        enc_bn0=bn(NUM_FEATURES),
        enc_fc1=dense(NUM_FEATURES, NUM_NEURONS),
        enc_bn1=bn(NUM_NEURONS),
        enc_fc2=dense(NUM_NEURONS, NUM_NEURONS),
        enc_fc3=dense(NUM_NEURONS, NUM_NEURONS),
        enc_mu=dense(NUM_NEURONS, LATENT_DIM),
        enc_sigma=dense(NUM_NEURONS, LATENT_DIM),
        dec_fc1=dense(LATENT_DIM, NUM_NEURONS),
        dec_fc2=dense(NUM_NEURONS, NUM_NEURONS),
        dec_out=dense(NUM_NEURONS, 21 * 6),
    )


# torch state-dict key → (field path) mapping for the released VPoser v2 ckpt
# (human_body_prior VPoser module naming).
# VPoser v2's encoder_net starts with a parameter-less BatchFlatten at
# Sequential index 0, so the first parameterized layer is encoder_net.1.
_TORCH_KEYMAP = {
    "encoder_net.1": "enc_bn0",
    "encoder_net.2": "enc_fc1",
    "encoder_net.4": "enc_bn1",
    "encoder_net.6": "enc_fc2",
    "encoder_net.7": "enc_fc3",
    "encoder_net.8.mu": "enc_mu",
    "encoder_net.8.logvar": "enc_sigma",
    "decoder_net.0": "dec_fc1",
    "decoder_net.3": "dec_fc2",
    "decoder_net.5": "dec_out",
}


def load_vposer_ckpt(path: str, dtype=jnp.float32) -> VPoserParams:
    """Load released VPoser v2 weights from a torch snapshot (the
    human_body_prior V02_05 `.ckpt`, whose state-dict keys carry a
    'vp_model.' prefix that the reference strips at load time — ref
    copenet_real/copenet_twoview.py:21-24 `load_model(...,
    remove_words_in_model_weights="vp_model.")`) or from an `.npz` with the
    same (already-stripped) keys."""
    if path.endswith(".npz"):
        blob = dict(np.load(path))
    else:
        import torch  # host-side weight loading only — not the compute path

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        blob = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    sd = {k.replace("vp_model.", ""): v for k, v in blob.items()}
    return convert_torch_state_dict(sd, dtype)


def convert_torch_state_dict(state_dict, dtype=jnp.float32) -> VPoserParams:
    """Convert a torch VPoser v2 state dict (tensors or ndarrays) to
    VPoserParams. Linear weights are transposed to (in, out)."""

    def arr(key):
        v = state_dict[key]
        v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        return jnp.asarray(v, dtype=dtype)

    def dense(prefix):
        return Dense(w=arr(prefix + ".weight").T, b=arr(prefix + ".bias"))

    def bn(prefix):
        return BatchNorm(
            scale=arr(prefix + ".weight"),
            bias=arr(prefix + ".bias"),
            mean=arr(prefix + ".running_mean"),
            var=arr(prefix + ".running_var"),
        )

    fields = {}
    for tkey, field in _TORCH_KEYMAP.items():
        fields[field] = bn(tkey) if "bn" in field else dense(tkey)
    return VPoserParams(**fields)
