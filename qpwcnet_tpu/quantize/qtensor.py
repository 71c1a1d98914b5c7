"""Quantized activation tensors that FLOW between layers.

Round-2's int8 execution mode was *slower* than bf16 (89 vs 112
pairs/s): every conv dequantized its int32 result to float, wrote the
float map to HBM, and the next conv re-read it and re-quantized — ~9
bytes/element of traffic where bf16 inference moves 4. The model is
HBM-bandwidth-bound (DESIGN.md), so the deployment artifact lost.

A :class:`QTensor` carries int8 values + the per-tensor scale across
layer boundaries. Where two convs are directly chained, the producer
quantizes its (bias+activation applied) output ONCE — with its own
QAT-calibrated output range — and the consumer feeds the int8 values
straight to the MXU, folding the producer's scale into its dequant
multiplier. Inter-layer HBM traffic drops to 1 byte/element and the
requantization pass disappears; XLA fuses the int32→dequant→bias→act→
requant epilogue into the conv so no float intermediate ever reaches
HBM. This is exactly the TFLite full-int8 execution model the
reference's deployment path intends (convert_tflite.py:211-219).

Non-conv consumers (cost volume, warp, BatchNorm, concat, resize) take
floats: blocks call :func:`dequantize` at those boundaries.

MEASURED OUTCOME (round 4, v5e, 448x1024 b8): chaining moved int8
inference from 89.2 to 95.2 pairs/s, but bf16 still wins at 112.5.
The remaining deficit is structural, not a missing fusion: the 81-ch
cost volumes, warps, BatchNorm and concat boundaries run float by
design (quantizing a correlation's input would square its error), and
those boundaries carry most of the HBM bytes in this bandwidth-bound
model, so int8's 2x compression applies only to a minority of the
traffic while every chain boundary still pays a requant epilogue.
int8 here is the deployment-artifact semantics (QAT-calibrated,
TFLite-parity, convert_quant.py), not a speedup over bf16.

ROUND-5 EXTENSION (VERDICT r4 task 4): combining int8 with the fused
warp+correlate kernel at the finest level (cv_impl='fast') removes
exactly the warped-feature float round-trip this account blames —
measured int8+fused = 112.5 pairs/s vs int8 95.6 (+18%), confirming
the attribution. It ties the round-4 bf16 exact headline (112.6) but
the round-5 bf16 paths moved too (stem-kernel exact 122.5, bf16+fast
151.8), so the conclusion stands: int8 remains the deployment
artifact, bf16 the throughput path. The stem kernel is float-only
(stem_stages rejects quant), so int8 also keeps the conv-stem layout
waste the float path no longer pays.
"""

from __future__ import annotations

from typing import NamedTuple, Union

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """int8 values + scalar f32 scale: x ≈ q.astype(f32) * scale."""

    q: jax.Array      # int8, any shape
    scale: jax.Array  # f32 scalar

    @property
    def shape(self):
        return self.q.shape


def dequantize(x: Union[QTensor, jax.Array],
               dtype=jnp.float32) -> jax.Array:
    """QTensor -> float array; float arrays pass through."""
    if isinstance(x, QTensor):
        return x.q.astype(dtype) * x.scale.astype(dtype)
    return x.astype(dtype) if x.dtype != dtype else x


def quantize_to(x: jax.Array, amax: jax.Array,
                qmax: float = 127.0) -> QTensor:
    """Symmetric per-tensor quantization to int8 given an absmax."""
    scale = (amax / qmax).astype(jnp.float32)
    safe = jnp.where(scale > 0, scale, 1.0)
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / safe), -qmax - 1, qmax
    ).astype(jnp.int8)
    return QTensor(q=q, scale=safe)
