from .int8_trunk import (calibrate_act_scales, calibration_clip_rates,
                         quantize_trunk_params,
                         resnet50_int8_infer, twoview_int8_forward,
                         Int8TwoView, Int8Inference)
from .qat import fake_quant_act, fake_quant_trunk_params, fake_quant_weight
from .int8_bottleneck import (int8_block, quantize_trunk_pallas,
                              resnet50_int8_pallas_infer)
from .fused_bottleneck import (
    fold_bn_into_conv,
    fuse_stage_params,
    fused_stage1,
    resnet50_fused_infer,
    stage1_params_from_variables,
)

__all__ = [
    "fold_bn_into_conv",
    "fuse_stage_params",
    "fused_stage1",
    "resnet50_fused_infer",
    "stage1_params_from_variables",
    "quantize_trunk_params",
    "calibrate_act_scales",
    "calibration_clip_rates",
    "fake_quant_act",
    "fake_quant_trunk_params",
    "fake_quant_weight",
    "resnet50_int8_infer",
    "twoview_int8_forward",
    "Int8TwoView",
    "Int8Inference",
    "int8_block",
    "quantize_trunk_pallas",
    "resnet50_int8_pallas_infer",
]
