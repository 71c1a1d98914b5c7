"""Quantization-capable conv modules.

These replace flax's nn.Conv/nn.ConvTranspose inside the model blocks —
owning their parameters directly (same names/shapes: HWIO 'kernel',
'bias') so that:
  * QAT is a constructor flag (`quant=QuantConfig()`), not graph surgery
    — the capability the reference needed ~400 lines of tfmot transforms
    for (qpwcnet/core/quantize/);
  * the int8 inference converter (qpwcnet_tpu.quantize.int8) can read
    kernels and activation ranges straight out of the param /
    quant_stats pytrees.

Activation fake-quant follows the Keras/tfmot placement: AFTER the
layer's activation function (Keras convs carry their activation;
tfmot wraps layer outputs).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from qpwcnet_tpu.quantize.fake_quant import (
    QuantConfig,
    fake_quant,
    weight_scale,
)
from qpwcnet_tpu.quantize.qtensor import QTensor, quantize_to


class ActQuant(nn.Module):
    """Per-tensor symmetric activation fake quant with an EMA absmax
    range in the 'quant_stats' collection (updated when update=True).

    emit_int8=True (int8 execution mode) returns a :class:`QTensor`
    quantized with the calibrated range instead of a fake-quantized
    float — the inter-layer int8 fast path (see quantize/qtensor.py).
    """

    quant: QuantConfig

    @nn.compact
    def __call__(self, x, update: bool = False, emit_int8: bool = False):
        amax = self.variable(
            "quant_stats", "amax", lambda: jnp.zeros((), jnp.float32)
        )
        if update and not self.is_initializing():
            batch_amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
            ema = self.quant.act_ema
            amax.value = jnp.where(
                amax.value > 0,
                ema * amax.value + (1.0 - ema) * batch_amax,
                batch_amax,
            )
        if emit_int8:
            return quantize_to(x, amax.value, self.quant.qmax)
        scale = amax.value / self.quant.qmax
        return fake_quant(x, scale.astype(x.dtype), self.quant.qmax)


def _dw_conv(x, kernel):
    """lax full-depthwise conv (stride 1, SAME): fast TPU forward."""
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "SAME",
        feature_group_count=x.shape[-1],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@jax.custom_vjp
def _depthwise_conv(x, kernel):
    """Full depthwise conv (stride 1, SAME, odd kernel) with a
    TPU-friendly custom VJP.

    Forward: the ordinary lax depthwise conv (XLA's forward emitter for
    feature_group_count=C is fine). The problem is autodiff's
    BACKWARD-FILTER pass: it lowers to a batch_group_count=C
    convolution, which XLA:TPU executes catastrophically slowly at the
    large group counts of this model's SepConv heads (C up to 593 at the
    coarsest Flow level) — measured 3.1 s/step for the 256x512 bs16
    train step, ~18x the whole step's roofline. The custom VJP computes
      * d_x  = depthwise conv of g with the spatially-flipped kernel
               (another forward-style feature-group conv), and
      * d_w  = per-tap multiply-reduce over (B, H, W) — kh*kw fused
               elementwise+reduction passes, no grouped conv at all.

    x: (B, H, W, C); kernel: (kh, kw, 1, C) -> (B, H, W, C).
    """
    return _dw_conv(x, kernel)


def _depthwise_conv_fwd(x, kernel):
    return _dw_conv(x, kernel), (x, kernel)


def _depthwise_conv_bwd(res, g):
    x, kernel = res
    kh, kw = kernel.shape[:2]
    ph, pw = kh // 2, kw // 2
    h, w = x.shape[1], x.shape[2]
    d_x = _dw_conv(g, kernel[::-1, ::-1]).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    taps = []
    for u in range(kh):
        for v in range(kw):
            prod = (xp[:, u:u + h, v:v + w, :] * g).astype(jnp.float32)
            taps.append(jnp.sum(prod, axis=(0, 1, 2)))
    d_w = jnp.stack(taps).reshape(kh, kw, 1, x.shape[-1])
    return d_x, d_w.astype(kernel.dtype)


_depthwise_conv.defvjp(_depthwise_conv_fwd, _depthwise_conv_bwd)


class QConv(nn.Module):
    """Conv2D (NHWC, HWIO kernel) with optional weight/activation int8
    fake quantization and an optional fused activation function."""

    features: int
    kernel_size: Sequence[int] = (3, 3)
    strides: Sequence[int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Any = jnp.float32
    act: Optional[Callable] = None
    quant: Optional[QuantConfig] = None
    # Per-input-channel input quantization: set on convs consuming
    # heterogeneous concats (UpFlow's [cost, features, flow]), where one
    # per-tensor input scale is dominated by the large flow channels and
    # starves the cost/feature channels of resolution. The channel
    # scales fold into the kernel in the int8 execution path, so the
    # arithmetic stays int8 x int8 (quantize/int8.py).
    per_channel_in: bool = False
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x, update_stats: bool = False,
                 emit_qtensor: bool = False):
        """x: float array, or a QTensor in int8 mode (fast path).
        emit_qtensor: in int8 mode, return the output as a QTensor
        quantized with this layer's calibrated activation range."""
        kh, kw = self.kernel_size
        in_ch = x.shape[-1] // self.feature_group_count
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, in_ch, self.features),
            jnp.float32,
        )

        amax_in = None
        if self.quant is not None:
            # Input range: tracked during QAT AND simulated with an
            # input fake-quant — the int8 execution mode quantizes every
            # conv input with this range, so the QAT graph must too or
            # training cannot adapt to input quantization error (e.g.
            # the UpFlow concat [cost, features, flow] shares one
            # per-tensor scale dominated by the flow channels; without
            # input FQ the deployed int8 EPE was 4x the QAT-sim EPE).
            in_shape = (x.shape[-1],) if self.per_channel_in else ()
            amax_in = self.variable(
                "quant_stats", "amax_in",
                lambda: jnp.zeros(in_shape, jnp.float32),
            )
            if (self.quant.mode == "qat" and update_stats
                    and not self.is_initializing()):
                if self.per_channel_in:
                    batch_amax = jnp.max(
                        jnp.abs(x), axis=tuple(range(x.ndim - 1))
                    ).astype(jnp.float32)
                else:
                    batch_amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
                ema = self.quant.act_ema
                amax_in.value = jnp.where(
                    amax_in.value > 0,
                    ema * amax_in.value + (1.0 - ema) * batch_amax,
                    batch_amax,
                )

        if self.quant is not None and self.quant.mode == "int8":
            from qpwcnet_tpu.quantize.int8 import int8_conv_apply

            y = int8_conv_apply(
                x, kernel, amax_in.value,
                strides=self.strides, padding=self.padding,
                feature_group_count=self.feature_group_count,
                qmax=self.quant.qmax,
            ).astype(self.dtype)
        else:
            assert not isinstance(x, QTensor), (
                "QTensor inputs are only valid in int8 execution mode")
            if self.quant is not None and self.quant.mode == "qat":
                scale_in = (amax_in.value / self.quant.qmax).astype(
                    x.dtype)
                x = fake_quant(x, scale_in, self.quant.qmax)
            if self.quant is not None and self.quant.quantize_weights:
                kernel = fake_quant(
                    kernel, weight_scale(kernel, self.quant.qmax),
                    self.quant.qmax,
                )
            if (self.feature_group_count > 1
                    and in_ch == 1
                    and self.features == self.feature_group_count
                    and tuple(self.strides) == (1, 1)
                    and self.padding == "SAME"
                    and kh % 2 == 1 and kw % 2 == 1):
                y = _depthwise_conv(
                    x.astype(self.dtype), kernel.astype(self.dtype)
                )
            else:
                y = jax.lax.conv_general_dilated(
                    x.astype(self.dtype),
                    kernel.astype(self.dtype),
                    window_strides=tuple(self.strides),
                    padding=self.padding,
                    feature_group_count=self.feature_group_count,
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        if self.act is not None:
            y = self.act(y)
        if self.quant is not None and self.quant.quantize_activations:
            y = ActQuant(self.quant, name="act_quant")(
                y, update_stats and self.quant.mode == "qat",
                emit_int8=emit_qtensor and self.quant.mode == "int8",
            )
        return y


class QConvTranspose(nn.Module):
    """ConvTranspose2D (NHWC, HWIO kernel) with optional quantization."""

    features: int
    kernel_size: Sequence[int] = (4, 4)
    strides: Sequence[int] = (2, 2)
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32
    act: Optional[Callable] = None
    quant: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False,
                 emit_qtensor: bool = False):
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )

        amax_in = None
        if self.quant is not None:
            amax_in = self.variable(
                "quant_stats", "amax_in",
                lambda: jnp.zeros((), jnp.float32),
            )
            if (self.quant.mode == "qat" and update_stats
                    and not self.is_initializing()):
                batch_amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
                ema = self.quant.act_ema
                amax_in.value = jnp.where(
                    amax_in.value > 0,
                    ema * amax_in.value + (1.0 - ema) * batch_amax,
                    batch_amax,
                )

        if self.quant is not None and self.quant.mode == "int8":
            from qpwcnet_tpu.quantize.int8 import int8_conv_apply

            y = int8_conv_apply(
                x, kernel, amax_in.value,
                strides=self.strides, padding=self.padding,
                transpose=True, qmax=self.quant.qmax,
            ).astype(self.dtype)
        else:
            assert not isinstance(x, QTensor), (
                "QTensor inputs are only valid in int8 execution mode")
            if self.quant is not None and self.quant.mode == "qat":
                # input FQ: match the int8 execution path (see QConv)
                scale_in = (amax_in.value / self.quant.qmax).astype(
                    x.dtype)
                x = fake_quant(x, scale_in, self.quant.qmax)
            if self.quant is not None and self.quant.quantize_weights:
                kernel = fake_quant(
                    kernel, weight_scale(kernel, self.quant.qmax),
                    self.quant.qmax,
                )
            y = jax.lax.conv_transpose(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                strides=tuple(self.strides),
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,),
                jnp.float32,
            )
            y = y + bias.astype(y.dtype)
        if self.act is not None:
            y = self.act(y)
        if self.quant is not None and self.quant.quantize_activations:
            y = ActQuant(self.quant, name="act_quant")(
                y, update_stats and self.quant.mode == "qat",
                emit_int8=emit_qtensor and self.quant.mode == "int8",
            )
        return y
