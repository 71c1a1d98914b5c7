"""True int8 inference path (the deployment-artifact equivalent of the
reference's TFLite conversion, app/quantize/convert_tflite.py — replaced
by an int8-executing jit function plus an exportable weight bundle).

The conv arithmetic runs int8 x int8 -> int32 on the MXU
(preferred_element_type=int32), dequantized by (input_scale *
per-channel weight_scale).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def quantize_tensor(x: jax.Array, scale: jax.Array,
                    qmax: float = 127.0) -> jax.Array:
    """f32 -> int8 given a symmetric scale (scalar or broadcastable)."""
    safe = jnp.where(scale > 0, scale, 1.0)
    return jnp.clip(
        jnp.round(x / safe), -qmax - 1, qmax
    ).astype(jnp.int8)


def int8_conv_apply(
    x,
    kernel: jax.Array,
    in_amax: jax.Array | None,
    strides: Sequence[int] = (1, 1),
    padding: str = "SAME",
    feature_group_count: int = 1,
    transpose: bool = False,
    qmax: float = 127.0,
) -> jax.Array:
    """Run a conv in int8 x int8 -> int32 on the MXU, dequantize.

    x: float array (quantized here with ``in_amax``, the QAT-calibrated
    input absmax) or a :class:`~qpwcnet_tpu.quantize.qtensor.QTensor`
    already carrying int8 values + scale from the producing layer — the
    inter-layer fast path (no requantization, 1 byte/element traffic).

    ``in_amax`` may be a PER-INPUT-CHANNEL vector (shape (Cin,)) for
    convs that consume heterogeneous concats (the UpFlow
    [cost, features, flow] input, where one per-tensor scale is
    dominated by the flow channels). The per-channel scales fold into
    the float kernel before kernel quantization — the conv is linear
    over input channels, so int8 arithmetic stays exact:
    conv(q_x * s_in[c], w) == conv(q_x, w * s_in[c]).
    Returns f32 output (bias/activation applied by the caller).
    """
    from qpwcnet_tpu.quantize.qtensor import QTensor

    kernel = kernel.astype(jnp.float32)
    if isinstance(x, QTensor):
        x_q, s_in = x.q, x.scale
    elif in_amax is not None and jnp.ndim(in_amax) == 1:
        # per-channel input quantization: quantize x per channel, fold
        # the (safe) channel scales into the kernel, dequantize by the
        # weight scale alone.
        s_vec = (in_amax / qmax).astype(jnp.float32)
        s_vec = jnp.where(s_vec > 0, s_vec, 1.0)
        x_q = quantize_tensor(x.astype(jnp.float32), s_vec, qmax)
        if kernel.shape[2] == 1 and feature_group_count == x.shape[-1]:
            kernel = kernel * s_vec[None, None, None, :]  # depthwise
        else:
            kernel = kernel * s_vec[None, None, :, None]
        s_in = jnp.float32(1.0)
    else:
        s_in = (in_amax / qmax).astype(jnp.float32)
        x_q = quantize_tensor(x.astype(jnp.float32), s_in, qmax)

    red = tuple(range(kernel.ndim - 1))
    w_amax = jnp.max(jnp.abs(kernel), axis=red, keepdims=True)
    s_w = (w_amax / qmax).astype(jnp.float32)
    k_q = quantize_tensor(kernel, s_w, qmax)

    if transpose:
        # conv_transpose spelled as an input-dilated conv so both
        # operands stay int8 on the MXU (conv_transpose has no
        # preferred_element_type parameter): window_strides=1,
        # lhs_dilation=strides, with conv_transpose's SAME/VALID
        # padding arithmetic (un-flipped kernel, matching
        # jax.lax.conv_transpose's transpose_kernel=False default).
        pads = []
        for k_dim, s in zip(k_q.shape[:2], strides):
            if padding == "SAME":
                pad_len = k_dim + s - 2
                pad_a = k_dim - 1 if s > k_dim - 1 else -(-pad_len // 2)
            else:  # VALID
                pad_len = k_dim + s - 2 + max(k_dim - s, 0)
                pad_a = k_dim - 1
            pads.append((pad_a, pad_len - pad_a))
        y = jax.lax.conv_general_dilated(
            x_q,
            k_q,
            window_strides=(1, 1),
            padding=pads,
            lhs_dilation=tuple(strides),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    else:
        y = jax.lax.conv_general_dilated(
            x_q,
            k_q,
            window_strides=tuple(strides),
            padding=padding,
            feature_group_count=feature_group_count,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    return y.astype(jnp.float32) * (s_in * s_w.reshape(1, 1, 1, -1))


class Int8Conv:
    """A materialized int8 conv (kernel stored as int8 + scales) for the
    exported deployment bundle."""

    def __init__(self, kernel_i8: np.ndarray, w_scale: np.ndarray,
                 bias: np.ndarray | None, in_amax):
        self.kernel_i8 = kernel_i8
        self.w_scale = w_scale
        self.bias = bias
        # scalar, or a per-input-channel vector for concat-consuming
        # convs (folded into kernel_i8/w_scale already — runtime
        # quantizes the input per channel and dequantizes by w_scale
        # alone, mirroring int8_conv_apply).
        self.in_amax = in_amax


def convert_to_int8(params, quant_stats, qmax: float = 127.0) -> dict:
    """Export every conv kernel as int8 + per-channel scales, paired with
    its QAT input range. Returns {path: Int8Conv}; serializable with
    save_int8_bundle (the TFLite-file equivalent)."""
    flat_params = dict(
        jax.tree_util.tree_flatten_with_path(params)[0]
    )
    flat_stats = dict(
        jax.tree_util.tree_flatten_with_path(quant_stats)[0]
    )

    def path_str(path):
        return "/".join(str(getattr(p, "key", p)) for p in path)

    # amax_in lives directly in the conv module's scope:
    # {...}/<conv_name>/amax_in  ->  prefix {...}/<conv_name>
    stats_by_prefix = {
        path_str(p[:-1]): np.asarray(v)
        for p, v in flat_stats.items()
        if getattr(p[-1], "key", None) == "amax_in"
    }

    out = {}
    for path, leaf in flat_params.items():
        if getattr(path[-1], "key", None) != "kernel":
            continue
        prefix = path_str(path[:-1])
        kernel = np.asarray(leaf, np.float32)
        in_amax = stats_by_prefix.get(prefix, np.float32(0.0))
        if np.ndim(in_amax) == 1:
            # per-channel input range (concat consumer): fold the input
            # scales into the kernel exactly as int8_conv_apply does.
            s_vec = np.where(in_amax > 0, in_amax / qmax, 1.0)
            if kernel.shape[2] == 1:  # depthwise
                kernel = kernel * s_vec[None, None, None, :]
            else:
                kernel = kernel * s_vec[None, None, :, None]
        red = tuple(range(kernel.ndim - 1))
        w_amax = np.max(np.abs(kernel), axis=red, keepdims=True)
        w_scale = np.where(w_amax > 0, w_amax / qmax, 1.0)
        k_q = np.clip(
            np.round(kernel / w_scale), -qmax - 1, qmax
        ).astype(np.int8)
        bias_path = path[:-1] + (jax.tree_util.DictKey("bias"),)
        bias = flat_params.get(bias_path)
        out[prefix] = Int8Conv(
            k_q,
            w_scale.astype(np.float32),
            None if bias is None else np.asarray(bias, np.float32),
            (np.asarray(in_amax, np.float32) if np.ndim(in_amax)
             else float(in_amax)),
        )
    return out


def save_int8_bundle(path, bundle: dict) -> None:
    """Serialize an int8 bundle to one .npz (deployment artifact)."""
    arrays = {}
    for name, conv in bundle.items():
        arrays[f"{name}::kernel_i8"] = conv.kernel_i8
        arrays[f"{name}::w_scale"] = conv.w_scale
        arrays[f"{name}::in_amax"] = np.asarray(conv.in_amax)
        if conv.bias is not None:
            arrays[f"{name}::bias"] = conv.bias
    np.savez_compressed(path, **arrays)


def load_int8_bundle(path) -> dict:
    data = np.load(path)
    names = sorted({k.split("::")[0] for k in data.files})
    out = {}
    for name in names:
        bias_key = f"{name}::bias"
        in_amax = data[f"{name}::in_amax"]
        out[name] = Int8Conv(
            data[f"{name}::kernel_i8"],
            data[f"{name}::w_scale"],
            data[bias_key] if bias_key in data.files else None,
            in_amax if in_amax.ndim else float(in_amax),
        )
    return out
