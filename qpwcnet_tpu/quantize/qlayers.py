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


def _s2d_conv(x, kernel):
    """Exactly-equivalent space-to-depth spelling of a 3x3/stride-2 SAME
    conv: a 2x2/stride-1 conv on the factor-2 space-to-depth input.

    Why: XLA:TPU picks spatial-minor layouts for low-channel-count convs
    (C=3 input, C=16 stems) and pays relayout copies around them — the
    round-4 attribution measured the encoder accessing 8.7 GB vs ~0.9 GB
    logical at the 448x1024 b8 headline (artifacts/hlo_bytes.py). The
    s2d form quadruples the contraction depth (C -> 4C) and halves the
    spatial extent, the classic TPU conv0 fix (cf. MLPerf ResNet
    space-to-depth stem).

    Derivation (XLA SAME for k=3,s=2 pads (0,1): out[i,j] =
    sum_{di,dj in 0..2} x[2i+di, 2j+dj] * k[di,dj]): with
    y[p,q, c*4+r*2+s] = x[2p+r, 2q+s, c], the output is a 2x2 conv over
    y with padding (0,1) and kernel k'[dp,dq, c*4+r*2+s, f] =
    k[2dp+r, 2dq+s, c, f] (zero where 2dp+r==3 or 2dq+s==3). The kernel
    PARAM keeps its reference (3,3,C,F) shape — the rearrange happens
    per call, so checkpoints transfer between formulations bit-for-bit.

    x: (B, H, W, C) with H, W even; kernel: (3, 3, C, F).
    """
    b, h, w, c = x.shape
    f = kernel.shape[-1]
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 5, 2, 4).reshape(b, h // 2, w // 2, 4 * c)
    kpad = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    k2 = kpad.reshape(2, 2, 2, 2, c, f)            # (dp, r, dq, s, c, f)
    k2 = k2.transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, 4 * c, f)
    return jax.lax.conv_general_dilated(
        y, k2, (1, 1), [(0, 1), (0, 1)],
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
    # Execute this conv in its space-to-depth spelling (see _s2d_conv);
    # exact for kernel 3x3 / stride 2 / SAME, and only applied there.
    # Float/QAT paths only — the int8 execution path keeps its own conv
    # (int8_conv_apply) unchanged.
    input_s2d: bool = False
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
            if (self.input_s2d
                    and (kh, kw) == (3, 3)
                    and tuple(self.strides) == (2, 2)
                    and self.padding == "SAME"
                    and self.feature_group_count == 1
                    and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0):
                y = _s2d_conv(
                    x.astype(self.dtype), kernel.astype(self.dtype)
                )
            elif (self.feature_group_count > 1
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
