from .smplx import (
    SMPLXOutput,
    SMPLXParams,
    load_smplx_npz,
    smplx_forward,
    synthetic_smplx_params,
)
from .vposer import (VPoserParams, vposer_decode, vposer_encode,
                     init_vposer_params, load_vposer_ckpt)

__all__ = [
    "SMPLXOutput",
    "SMPLXParams",
    "load_smplx_npz",
    "smplx_forward",
    "synthetic_smplx_params",
    "VPoserParams",
    "vposer_decode",
    "vposer_encode",
    "init_vposer_params",
    "load_vposer_ckpt",
]
