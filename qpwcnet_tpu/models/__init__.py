from qpwcnet_tpu.models.blocks import (
    SepConv,
    DownConv,
    UpConv,
    OptFlow,
    FlowBlock,
    UpFlowBlock,
    FrameInterpolate,
)
from qpwcnet_tpu.models.pwcnet import (
    Encoder,
    Decoder,
    Flower,
    PWCFlowNet,
    PWCInterpolator,
    build_flow_net,
    build_interpolator,
)

__all__ = [
    "SepConv",
    "DownConv",
    "UpConv",
    "OptFlow",
    "FlowBlock",
    "UpFlowBlock",
    "FrameInterpolate",
    "Encoder",
    "Decoder",
    "Flower",
    "PWCFlowNet",
    "PWCInterpolator",
    "build_flow_net",
    "build_interpolator",
]
