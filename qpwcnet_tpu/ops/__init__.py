from qpwcnet_tpu.ops.activations import mish, leaky_relu
from qpwcnet_tpu.ops.warp import backward_warp, backward_warp_manual
from qpwcnet_tpu.ops.cost_volume import cost_volume, cost_volume_xla
from qpwcnet_tpu.ops.resize import (
    upsample2x_bilinear,
    avg_pool_2x,
    block_mean_downsample,
    resize_bilinear,
)
from qpwcnet_tpu.ops.flow_vis import flow_to_image, cost_volume_to_flow
from qpwcnet_tpu.ops.occlusion import estimate_occlusion_map, invert_flow

__all__ = [
    "mish",
    "leaky_relu",
    "backward_warp",
    "backward_warp_manual",
    "cost_volume",
    "cost_volume_xla",
    "upsample2x_bilinear",
    "avg_pool_2x",
    "block_mean_downsample",
    "resize_bilinear",
    "flow_to_image",
    "cost_volume_to_flow",
    "estimate_occlusion_map",
    "invert_flow",
]
