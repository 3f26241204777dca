from .airpose import (
    AirPoseTwoView,
    AirPoseTwoViewSep,
    AirPoseTwoViewSepView,
    FullCamOutput,
    HMR,
    MuHMR,
    SingleViewFullCam,
    WeakCamOutput,
    mean_init_state,
)
from .regressor import RegressorCore, load_mean_params
from .resnet import ResNet50

MODEL_REGISTRY = {
    "hmr": HMR,
    "copenet_singleview": SingleViewFullCam,
    "muhmr": MuHMR,
    "copenet_twoview": AirPoseTwoView,
    "copenet_twoview_sep": AirPoseTwoViewSep,
}


def family_init_args(family: str, batch_size: int = 1, img_res: int = 224):
    """Positional ``model.init`` args for each model family (tiny dummy
    shapes — parameter shapes are resolution-independent thanks to the
    trunk's global average pool)."""
    import jax.numpy as jnp

    B = batch_size
    img = jnp.zeros((B, 2, img_res, img_res, 3))
    if family == "hmr":
        return (img[:, 0],)
    if family == "copenet_singleview":
        return (img[:, 0], jnp.zeros((B, 3)), jnp.full((B, 3), 0.5))
    if family == "muhmr":
        return (img,)
    if family in ("copenet_twoview", "copenet_twoview_sep"):
        return (img, jnp.zeros((B, 2, 3)), jnp.full((B, 2, 3), 0.5))
    raise ValueError(f"unknown model family: {family}")

__all__ = [
    "AirPoseTwoView",
    "AirPoseTwoViewSep",
    "AirPoseTwoViewSepView",
    "FullCamOutput",
    "HMR",
    "MuHMR",
    "SingleViewFullCam",
    "WeakCamOutput",
    "mean_init_state",
    "RegressorCore",
    "load_mean_params",
    "ResNet50",
    "MODEL_REGISTRY",
    "family_init_args",
]
