"""Training losses (port of qpwcnet/train/loss.py + the epe metric).

All NHWC, flow in (x, y) channel order. The two ACTIVE reference losses are
reproduced exactly:

  * :func:`multiscale_flow_loss` — FlowMseLossV2 (loss.py:134-174), the
    loss actually used by supervised flow training
    (app/optical_flow/train.py:546): block-mean downsample of the GT flow
    by exact integer factors, flow magnitude scaled by pred_h/true_h, then
    Huber(delta=0.1) on flow scaled by 2/(w+h) — i.e. flow expressed in
    normalized image units with delta ~= 10% of the image span. Applied
    over the multiscale predictions EXCLUDING the final bilinear-only
    output (train.py:271-275).
  * :func:`auto_resize_mse_loss` — AutoResizeMseLoss (loss.py:177-198),
    the pretraining loss: bilinear-resize GT image to the prediction's
    scale, plain MSE; applied to ALL multiscale interpolator outputs
    (pre_train.py:54-72).

Also provided for capability parity:
  * :func:`flow_mse_loss` — FlowMseLoss (loss.py:25-82): bilinear-resized
    GT, mean L2-norm over the channel axis.
  * :func:`flow_finetune_loss` — FlowMseLossFineTune (loss.py:85-131):
    robust `mean((||d||_1 + eps)^q)`, q=0.4, eps=0.01 (PWC-Net fine-tune).
  * :func:`epe_error` — end-point-error metric
    (app/optical_flow/train.py:247-253).
  * :func:`l2_regularization` — the Keras kernel l2 regularizers
    (gamma=4e-6 on DownConv/UpConv kernels; layers.py:12) collected into
    one explicit loss term (the `sum(model.losses)` of train.py:110).

The AdaptiveResizedLoss variants (loss.py:200-348) are intentionally out
of scope: they depend on a vendored google-research robust_loss package
that is absent from the reference repo (train/.gitignore) and are
dead-coded off (train.py:329); see SURVEY.md §7 "hard parts".
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from qpwcnet_tpu.ops.resize import block_mean_downsample, resize_bilinear


def _huber(err: jax.Array, delta: float) -> jax.Array:
    """Elementwise Huber loss (Keras tf.keras.losses.Huber semantics:
    0.5*e² below delta, delta*(|e| - 0.5*delta) above; reduced by mean)."""
    abs_e = jnp.abs(err)
    quad = 0.5 * jnp.square(err)
    lin = delta * (abs_e - 0.5 * delta)
    return jnp.where(abs_e <= delta, quad, lin)


def flow_loss_v2(flo_true: jax.Array, flo_pred: jax.Array,
                 delta: float = 0.1) -> jax.Array:
    """FlowMseLossV2 for one scale (loss.py:144-174)."""
    th, tw = flo_true.shape[1], flo_true.shape[2]
    ph, pw = flo_pred.shape[1], flo_pred.shape[2]
    flow_scale = ph / th
    loss_scale = 2.0 / (pw + ph)
    true_down = flow_scale * block_mean_downsample(
        flo_true, th // ph, tw // pw
    )
    err = loss_scale * true_down - loss_scale * flo_pred
    return jnp.mean(_huber(err, delta))


def multiscale_flow_loss(
    flo_true: jax.Array, flo_preds: Sequence[jax.Array],
    delta: float = 0.1,
) -> jax.Array:
    """Sum of FlowMseLossV2 over all scales except the final bilinear-only
    output (train.py:271-275 trains on pred_flows[:-1])."""
    return sum(flow_loss_v2(flo_true, p, delta) for p in flo_preds[:-1])


def flow_mse_loss(flo_true: jax.Array, flo_pred: jax.Array) -> jax.Array:
    """FlowMseLoss (loss.py:25-82): bilinear-resize GT to pred resolution
    with magnitude rescale, then mean channel-axis L2 norm."""
    th = flo_true.shape[1]
    ph, pw = flo_pred.shape[1], flo_pred.shape[2]
    scale = ph / th
    true_down = resize_bilinear(flo_true, (ph, pw)) * scale
    return jnp.mean(
        jnp.linalg.norm(true_down - flo_pred, axis=-1)
    )


def flow_finetune_loss(
    flo_true: jax.Array, flo_pred: jax.Array,
    q: float = 0.4, eps: float = 0.01,
) -> jax.Array:
    """FlowMseLossFineTune (loss.py:85-131): mean((||d||_1 + eps)^q)."""
    th = flo_true.shape[1]
    ph, pw = flo_pred.shape[1], flo_pred.shape[2]
    scale = ph / th
    true_down = resize_bilinear(flo_true, (ph, pw)) * scale
    err = jnp.sum(jnp.abs(true_down - flo_pred), axis=-1)
    return jnp.mean(jnp.power(err + eps, q))


def auto_resize_mse_loss(img_true: jax.Array,
                         img_pred: jax.Array) -> jax.Array:
    """AutoResizeMseLoss (loss.py:177-198): resize GT image to pred scale,
    plain MSE."""
    ph, pw = img_pred.shape[1], img_pred.shape[2]
    true_down = resize_bilinear(img_true, (ph, pw))
    return jnp.mean(jnp.square(true_down - img_pred))


def multiscale_interp_loss(
    img_true: jax.Array, img_preds: Sequence[jax.Array]
) -> tuple[jax.Array, dict]:
    """Sum of AutoResizeMseLoss over ALL interpolator outputs
    (pre_train.py:54-72), plus a per-scale dict for logging (the
    reference's img_0_loss..img_5_loss names, README.md:56-70)."""
    per_scale = {
        f"img_{i}_loss": auto_resize_mse_loss(img_true, p)
        for i, p in enumerate(img_preds)
    }
    return sum(per_scale.values()), per_scale


def epe_error(flo_true: jax.Array, flo_pred: jax.Array) -> jax.Array:
    """End-point error: mean L2 norm of the flow residual at full
    resolution (app/optical_flow/train.py:247-253)."""
    return jnp.mean(jnp.linalg.norm(flo_true - flo_pred, axis=-1))


def l2_regularization(params, gamma: float = 4e-6) -> jax.Array:
    """Kernel l2 regularization matching the reference's
    tf.keras.regularizers.l2(gamma) on DownConv/UpConv conv kernels
    (layers.py:12,521,267): gamma * sum(kernel**2) over encoder/decoder
    kernels. Keras l2 sums, it does not average.

    Selects params whose path contains 'conv_a'/'conv_aa'/'conv_b'
    (DownConv) or 'conv_up' (UpConv) and leaf name 'kernel'.
    """
    reg_names = ("conv_a", "conv_aa", "conv_b", "conv_up")

    total = jnp.asarray(0.0, jnp.float32)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        if keys and keys[-1] == "kernel" and any(
            k in reg_names for k in keys
        ):
            total = total + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    return gamma * total
