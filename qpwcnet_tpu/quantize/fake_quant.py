"""Int8 fake quantization with straight-through estimation.

The TPU-native replacement for the reference's tfmot QAT graph surgery
(qpwcnet/core/quantize/quantize.py, transform.py): instead of
pattern-matching Keras graphs and wrapping layers in FQ nodes after the
fact, quantization is a first-class option of the conv modules
(qpwcnet_tpu.quantize.qlayers) — the entire reason the reference needed
its RecursiveDelegateConfig / OptFlowQuantize transforms disappears.

Scheme parity with tfmot's Default8Bit scheme (what
Custom8BitQuantizeScheme extends, transform.py:160-213):
  * weights: symmetric int8, per-output-channel scales;
  * activations: symmetric int8, per-tensor scale tracked by EMA of the
    batch absmax during training (tfmot uses EMA min/max; symmetric
    absmax is its TPU-friendly equivalent).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class QuantConfig:
    """Quantization configuration.

    mode:
      'qat'  — fake-quantized f32 arithmetic with STE gradients +
               activation-range EMA tracking (training / simulation);
      'int8' — true int8 conv arithmetic (int8 x int8 -> int32 on the
               MXU) using the ranges learned during QAT (inference).
    """

    bits: int = 8
    act_ema: float = 0.999          # EMA decay for activation ranges
    quantize_weights: bool = True
    quantize_activations: bool = True
    mode: str = "qat"

    @property
    def qmax(self) -> float:
        return float(2 ** (self.bits - 1) - 1)  # 127 for int8


def fake_quant(x: jax.Array, scale: jax.Array,
               qmax: float = 127.0) -> jax.Array:
    """Symmetric fake quantization with a straight-through gradient.

    scale broadcasts against x; zero/negative scales pass x through
    (uncalibrated ranges at step 0).
    """
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(jnp.round(x / safe), -qmax - 1, qmax) * safe
    q = jnp.where(scale > 0, q, x)
    return x + jax.lax.stop_gradient(q - x)


def weight_scale(kernel: jax.Array, qmax: float = 127.0) -> jax.Array:
    """Per-output-channel symmetric scale for an HWIO (or IO) kernel:
    absmax over all but the last axis / qmax."""
    red = tuple(range(kernel.ndim - 1))
    amax = jnp.max(jnp.abs(kernel), axis=red, keepdims=True)
    return amax / qmax


def quantize_weight_scales(params, qmax: float = 127.0):
    """Map a param pytree to the per-channel scales of every 'kernel'."""

    def fn(path, leaf):
        if path[-1].key == "kernel":
            return weight_scale(leaf, qmax)
        return None

    return jax.tree_util.tree_map_with_path(fn, params)
