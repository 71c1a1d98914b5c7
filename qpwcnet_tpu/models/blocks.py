"""Neural building blocks (Flax linen, NHWC only).

One implementation per block — the reference maintained twin copies
(qpwcnet/core/layers.py Keras Layers vs non_layers.py plain functors,
split only because tfmot QAT couldn't transform nested custom layers;
qpwcnet/app/quantize/README.md). Here quantization is a constructor flag
(`quant=QuantConfig()`) threaded into the conv modules
(qpwcnet_tpu.quantize.qlayers), so a single implementation covers float
training, QAT, and int8 inference. Where the twins differ, the
**non_layers** variants are authoritative because the model builders
import those (qpwcnet/core/pwcnet.py:7-17).

Numerics preserved from the reference (SURVEY.md §7 "reproduce the
numerics that matter"):
  * cost volume: channel-mean of products at 81 offsets + leaky_relu(0.1);
  * OptFlow raw output multiplied by sqrt(h² + w²) of its input resolution
    (non_layers.py:262) — flow is regressed in normalized units;
  * OptFlow includes the extra 1×1 Mish conv of the non_layers variant
    (non_layers.py:238-241);
  * BatchNorm with Keras defaults (momentum .99, eps 1e-3), kept in f32;
  * DownConv/UpConv kernel l2 regularization gamma=4e-6 (layers.py:12) is
    applied by the training loss over params named 'kernel' in these
    blocks (see qpwcnet_tpu.train.losses.l2_regularization).

Compute dtype: blocks accept `dtype` (e.g. jnp.bfloat16) for MXU-friendly
mixed precision; params stay float32; BatchNorm statistics and the OptFlow
output scale are always f32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from qpwcnet_tpu.ops.activations import mish
from qpwcnet_tpu.ops.cost_volume import cost_volume
from qpwcnet_tpu.ops.warp import backward_warp
from qpwcnet_tpu.quantize.fake_quant import QuantConfig
from qpwcnet_tpu.quantize.qlayers import QConv, QConvTranspose

# Reference l2 coefficient for DownConv/UpConv kernels (layers.py:12).
L2_GAMMA = 4e-6


def _dw_quant(quant: Optional[QuantConfig]) -> Optional[QuantConfig]:
    """Depthwise halves of separable convs quantize weights only — the
    Keras SeparableConv2D is ONE layer, so tfmot places no FQ between its
    depthwise and pointwise stages."""
    if quant is None:
        return None
    return dataclasses.replace(quant, quantize_activations=False)


def _int8_mode(quant: Optional[QuantConfig]) -> bool:
    """True when executing with real int8 arithmetic — conv chains then
    pass QTensors (int8 values + scale) between layers instead of float
    maps. MEASURED: chaining recovered part of the int8 deficit (89.2
    r2 -> 95.2 r4 pairs/s) but the deployment artifact is still slower
    than bf16 inference (112.5) — the cost-volume/warp/concat
    boundaries stay float and dominate HBM traffic, and each chain
    boundary pays a requant epilogue (quantize/qtensor.py has the full
    account). int8 remains the deployment-artifact path (TFLite-parity
    semantics), not a throughput optimization."""
    return quant is not None and quant.mode == "int8"


class SepConv(nn.Module):
    """Keras SeparableConv2D parity: depthwise kxk (no bias) + pointwise
    1x1 (bias) + activation (+ output fake-quant under QAT)."""

    features: int
    kernel: int = 3
    dtype: Any = jnp.float32
    quant: Optional[QuantConfig] = None
    # per-channel input quantization on the depthwise stage: set where
    # the input is a heterogeneous concat (see QConv.per_channel_in).
    per_channel_in: bool = False

    @nn.compact
    def __call__(self, x, update_stats: bool = False,
                 emit_qtensor: bool = False):
        c_in = x.shape[-1]
        # int8 mode: the depthwise stage consumes a QTensor input (when
        # the caller chains SepConvs) but emits float — its output range
        # is uncalibrated (no FQ between dw and pw stages, see
        # _dw_quant); the pointwise stage re-quantizes via its amax_in.
        x = QConv(
            features=c_in,
            kernel_size=(self.kernel, self.kernel),
            feature_group_count=c_in,
            use_bias=False,
            dtype=self.dtype,
            quant=_dw_quant(self.quant),
            per_channel_in=self.per_channel_in,
            name="depthwise",
        )(x, update_stats)
        return QConv(
            features=self.features,
            kernel_size=(1, 1),
            use_bias=True,
            dtype=self.dtype,
            act=mish,
            quant=self.quant,
            name="pointwise",
        )(x, update_stats, emit_qtensor=emit_qtensor)


class DownConv(nn.Module):
    """Encoder stage: Conv(3x3,s2,Mish) -> Conv(3x3,s1,Mish) ->
    Conv(3x3,s1,Mish) (layers.py:498-571). The encoder runs with
    use_normalizer=False (pwcnet.py:146) — AGC replaces batchnorm."""

    features: int
    use_normalizer: bool = False
    dtype: Any = jnp.float32
    quant: Optional[QuantConfig] = None
    # Space-to-depth spelling of the stride-2 conv_a (exact; see
    # qlayers._s2d_conv): the low-channel-count stems otherwise make
    # XLA:TPU pick spatial-minor layouts and pay GB-scale relayout
    # copies (round-4 attribution, artifacts/hlo_bytes.py).
    s2d: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False,
                 emit_qtensor: bool = False):
        # int8 mode (no normalizer): the three convs chain QTensors —
        # each conv's output is quantized once with its calibrated range
        # and consumed as int8 by the next (1 byte/element inter-conv
        # traffic). BN between convs forces the float path.
        chain_q = _int8_mode(self.quant) and not self.use_normalizer
        names = (("conv_a", 2), ("conv_aa", 1), ("conv_b", 1))
        for k, (name, stride) in enumerate(names):
            last = k == len(names) - 1
            x = QConv(
                features=self.features,
                kernel_size=(3, 3),
                strides=(stride, stride),
                dtype=self.dtype,
                act=mish,
                quant=self.quant,
                input_s2d=self.s2d and stride == 2,
                name=name,
            )(x, update_stats=train,
              emit_qtensor=(emit_qtensor if last else chain_q))
            if self.use_normalizer:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.99,
                    epsilon=1e-3,
                    dtype=jnp.float32,
                    name=f"norm_{name[5:]}",
                )(x)
        return x


class UpConv(nn.Module):
    """Decoder stage: ConvTranspose(4x4, s2, Mish) (layers.py:255-282)."""

    features: int
    dtype: Any = jnp.float32
    quant: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, x, update_stats: bool = False,
                 emit_qtensor: bool = False):
        return QConvTranspose(
            features=self.features,
            kernel_size=(4, 4),
            strides=(2, 2),
            dtype=self.dtype,
            act=mish,
            quant=self.quant,
            name="conv_up",
        )(x, update_stats, emit_qtensor=emit_qtensor)


class OptFlow(nn.Module):
    """Flow-regression head (non_layers.py:213-273): 4 SeparableConvs
    (128/64/32/16, Mish) -> 1x1 Conv Mish -> BatchNorm -> 3x3 Conv (2ch,
    no bias), multiplied by sqrt(h² + w²) of the input resolution."""

    filters: Sequence[int] = (128, 64, 32, 16)
    dtype: Any = jnp.float32
    quant: Optional[QuantConfig] = None
    # Zero-init the final flow conv (deliberate deviation from the
    # reference's glorot init): the sqrt(h²+w²) output scale (~573 at
    # 256x512) amplifies a random-init conv into a ~75 px starting
    # error that training spends thousands of steps escaping (the
    # round-2 "75 -> 5 px collapse" mostly measured this escape, not
    # flow learning). Zero-init starts at exactly the predict-zero
    # baseline; gradients w.r.t. the kernel are unaffected (input and
    # upstream are nonzero), and the converged behavior class is
    # unchanged. Param shapes/counts identical to the reference.
    zero_init_flow: bool = True
    # Output parameterization of the flow head:
    #   'diag' — reference parity (non_layers.py:268-271): raw conv
    #     output multiplied by sqrt(h²+w²) of the level resolution.
    #     MEASURED PATHOLOGY when training from scratch: under Adam a
    #     per-step kernel move of ~lr translates to ~lr*573 px of
    #     output change at 256x512, so the heads random-walk (fresh-
    #     data EPE pinned at the predict-zero baseline for 7.6k steps,
    #     then loss blow-ups; /tmp diag rounds E..M, RESULTS.md). The
    #     reference only ever trains flow FROM an interp-pretrained
    #     init (pre_train.py -> train.py load_weights), which is how it
    #     sidesteps this.
    #   'unit' — the head emits flow directly in level-local px
    #     (values O(search_range)); the trainable-from-scratch mode.
    head_scale: str = "diag"

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        scale = (float(h * h + w * w) ** 0.5
                 if self.head_scale == "diag" else 1.0)

        # int8 mode: the SepConv chain passes QTensors (each pointwise
        # output quantized once with its calibrated range, the next
        # depthwise consumes int8); the 1x1 conv emits float because
        # BatchNorm follows.
        chain_q = _int8_mode(self.quant)
        for i, f in enumerate(self.filters):
            # The FIRST SepConv consumes the heterogeneous
            # [cost, features, flow] concat — per-channel input
            # quantization there, or the flow channels' range starves
            # the 81 cost channels of int8 resolution (VERDICT r2
            # weak #2; cf. tfmot per-axis conv quantization,
            # qpwcnet/core/quantize/quantize.py:256-388).
            x = SepConv(f, dtype=self.dtype, quant=self.quant,
                        per_channel_in=(i == 0),
                        name=f"of_feat_{i}")(x, update_stats=train,
                                             emit_qtensor=chain_q)
        x = QConv(
            features=self.filters[-1],
            kernel_size=(1, 1),
            use_bias=True,
            dtype=self.dtype,
            act=mish,
            quant=self.quant,
            name="conv1x1",
        )(x, update_stats=train)
        # BN + flow conv in f32 for numerical parity under bf16 compute.
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.99,
            epsilon=1e-3,
            dtype=jnp.float32,
            name="norm",
        )(x.astype(jnp.float32))
        if not self.zero_init_flow:
            kinit = nn.initializers.lecun_normal()  # reference glorot-ish
        elif self.head_scale == "unit":
            # Symmetry-breaking SMALL init (~1e-2 px outputs): exact
            # zeros put fresh-data training on an ignition knife-edge —
            # whether the heads ever grow flips with 4e-6-scale loss
            # perturbations (RESULTS.md round-3 probes A1-A4). Safe
            # here because 'unit' has no sqrt(h²+w²) amplification.
            kinit = nn.initializers.normal(stddev=1e-2)
        else:
            kinit = nn.initializers.zeros  # 'diag': 573x amplified
        x = QConv(
            features=2,
            kernel_size=(3, 3),
            use_bias=False,
            dtype=jnp.float32,
            quant=self.quant,
            kernel_init=kinit,
            name="of_flow",
        )(x, update_stats=train)
        return scale * x


class FlowBlock(nn.Module):
    """Coarsest-level flow estimator (layers.py:405-440):
    concat[cost_volume(prv, nxt), prv, nxt] -> OptFlow.

    spatial: a parallel.spatial_ops.SpatialConfig when the forward runs
    H-sharded — the cost volume then halo-exchanges rows between shards
    and keeps the fused Pallas kernel (the spatial fast path)."""

    dtype: Any = jnp.float32
    cv_impl: str = "auto"
    quant: Optional[QuantConfig] = None
    spatial: Any = None
    head_scale: str = "diag"

    @nn.compact
    def __call__(self, prv, nxt, train: bool = False):
        if self.spatial is not None:
            from qpwcnet_tpu.parallel.spatial_ops import (
                cost_volume_spatial)

            cost = cost_volume_spatial(prv, nxt, self.spatial)
        else:
            cost = cost_volume(prv, nxt, impl=self.cv_impl)
        feat = jnp.concatenate([cost, prv, nxt], axis=-1)
        return OptFlow(dtype=self.dtype, quant=self.quant,
                       head_scale=self.head_scale,
                       name="flow")(feat, train=train)


class UpFlowBlock(nn.Module):
    """Per-level flow refinement (layers.py:443-495): warp nxt by the
    upsampled flow, correlate against prv, concat[cost, prv, flo] ->
    OptFlow. Note: the warped features are NOT concatenated (layers.py:482)
    — only cost, prv, flo.

    spatial: see FlowBlock — additionally bounds the warp to a
    ±warp_halo row window per shard instead of the all-gather fallback."""

    dtype: Any = jnp.float32
    cv_impl: str = "auto"
    quant: Optional[QuantConfig] = None
    spatial: Any = None
    head_scale: str = "diag"
    # residual=True: the head predicts a CORRECTION added to the
    # upsampled coarse flow (out = flo + OptFlow(...)), so each level
    # only regresses the residual its own ±r cost volume can actually
    # see. The reference re-estimates the full flow per level
    # (layers.py:443-495, no add) and relies on interp-pretraining to
    # make that trainable; residual mode is the from-scratch-trainable
    # deviation (param shapes unchanged).
    residual: bool = False

    @nn.compact
    def __call__(self, prv, nxt, flo, train: bool = False):
        if self.spatial is not None:
            from qpwcnet_tpu.parallel.spatial_ops import (
                backward_warp_spatial, cost_volume_spatial)

            nxt_w = backward_warp_spatial(
                nxt, flo.astype(jnp.float32), self.spatial)
            cost = cost_volume_spatial(prv, nxt_w, self.spatial)
        elif self.cv_impl == "fused":
            # Opt-in fast path (BASELINE.json north star): warp +
            # correlate in one VMEM-resident Pallas kernel. The
            # in-kernel warp clamps per-pixel displacements to
            # ±FUSED_WARP_WINDOW (window-warp approximation — pixels
            # whose incoming flow exceeds the window lose refinement at
            # this level; see ops/pallas/warp_cv_kernel.py and the
            # measured EPE delta in DESIGN.md). In training the fused
            # forward carries a custom VJP (exact for the window-warp
            # forward; backward recomputes the warp through the unfused
            # measured-fast VJPs, checkpoint-style).
            from qpwcnet_tpu.ops.pallas.warp_cv_kernel import (
                FUSED_WARP_WINDOW,
                warp_cost_volume_pallas,
                warp_cost_volume_trainable,
            )

            op = (warp_cost_volume_trainable if train
                  else warp_cost_volume_pallas)
            cost = op(
                prv, nxt, flo.astype(jnp.float32),
                warp_window=FUSED_WARP_WINDOW,
                interpret=jax.default_backend() != "tpu",
            )
        else:
            nxt_w = backward_warp(nxt, flo.astype(jnp.float32))
            cost = cost_volume(prv, nxt_w, impl=self.cv_impl)
        feat = jnp.concatenate(
            [cost, prv, flo.astype(prv.dtype)], axis=-1
        )
        out = OptFlow(dtype=self.dtype, quant=self.quant,
                      head_scale=self.head_scale,
                      name="flow")(feat, train=train)
        if self.residual:
            out = out + flo.astype(out.dtype)
        return out


class FrameInterpolate(nn.Module):
    """Middle-frame synthesis head (layers.py:356-402): warp nxt by
    0.5*flo_01 and prv by 0.5*flo_10, concat [prv_w, nxt_w, flo_01, flo_10
    (+img_u if up)], SeparableConv(64, Mish) -> 1x1 Conv -> 3ch."""

    up: bool = False
    dtype: Any = jnp.float32
    quant: Optional[QuantConfig] = None

    @nn.compact
    def __call__(self, prv, nxt, flo_01, flo_10, img_u=None,
                 train: bool = False):
        flo_01f = flo_01.astype(jnp.float32)
        flo_10f = flo_10.astype(jnp.float32)
        nxt_w = backward_warp(nxt, 0.5 * flo_01f)
        prv_w = backward_warp(prv, 0.5 * flo_10f)

        feats = [prv_w, nxt_w, flo_01f.astype(prv.dtype),
                 flo_10f.astype(prv.dtype)]
        if self.up:
            assert img_u is not None
            feats.append(img_u.astype(prv.dtype))
        x = jnp.concatenate(feats, axis=-1)
        # conv1 consumes the [prv_w, nxt_w, flo_01, flo_10(, img_u)]
        # concat: per-channel input quant for the same reason as
        # OptFlow's first SepConv (flow channels dominate the range).
        x = SepConv(64, dtype=self.dtype, quant=self.quant,
                    per_channel_in=True,
                    name="conv1")(x, update_stats=train,
                                  emit_qtensor=_int8_mode(self.quant))
        x = QConv(
            features=3,
            kernel_size=(1, 1),
            dtype=self.dtype,
            quant=self.quant,
            name="conv2",
        )(x, update_stats=train)
        return x.astype(jnp.float32)
