from qpwcnet_tpu.quantize.fake_quant import (
    QuantConfig,
    fake_quant,
    quantize_weight_scales,
)
from qpwcnet_tpu.quantize.qlayers import QConv, QConvTranspose, ActQuant
from qpwcnet_tpu.quantize.int8 import (
    convert_to_int8,
    int8_conv_apply,
    Int8Conv,
)

__all__ = [
    "QuantConfig",
    "fake_quant",
    "quantize_weight_scales",
    "QConv",
    "QConvTranspose",
    "ActQuant",
    "convert_to_int8",
    "int8_conv_apply",
    "Int8Conv",
]
