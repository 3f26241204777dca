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
]
