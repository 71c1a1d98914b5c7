"""Jitted training steps (the TPU equivalent of the reference's
TrainModel.train_step, app/optical_flow/train.py:256-309 and
app/frame_interpolation/pre_train.py:44-81).

One fused XLA program per step: forward -> multiscale loss (+ kernel l2
regularization) -> grad -> NaN-grad scrub -> AGC -> Adam. The reference
ran these as separate TF ops on GPU; under jit, XLA fuses the whole chain.

Data parallelism: the step functions are pure and shape-stable; wrap them
with qpwcnet_tpu.parallel.make_parallel_step to shard the batch over a
('data',) mesh — gradients all-reduce over ICI automatically via XLA.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import core, struct

from qpwcnet_tpu.train.agc import agc, zero_nan_grads
from qpwcnet_tpu.train.losses import (
    epe_error,
    l2_regularization,
    multiscale_flow_loss,
    multiscale_interp_loss,
)


class TrainState(struct.PyTreeNode):
    """Train state: params + BatchNorm running stats + optimizer state
    (+ QAT activation ranges when quantization is enabled)."""

    step: jax.Array
    params: core.FrozenDict[str, Any]
    batch_stats: core.FrozenDict[str, Any]
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    quant_stats: core.FrozenDict[str, Any] = core.FrozenDict()

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
        )


def default_optimizer(
    learning_rate=1e-4, clip_factor: float = 0.01, eps: float = 1e-3
) -> optax.GradientTransformation:
    """NaN-grad scrub -> AGC -> Adam, matching the reference training apps
    (train.py:120,294-296; Adam 1e-4 train.py:370-375).

    The flow heads ('of_flow') are exempt from AGC — the NF-Nets-style
    final-layer exemption. Blanket AGC on the (near-)zero-init heads
    caps their gradients at clip*eps and measurably prevents fresh-data
    training from ever leaving the predict-zero baseline (RESULTS.md
    round-3 diagnosis, probe A1)."""
    return optax.chain(
        zero_nan_grads(),
        agc(clip_factor=clip_factor, eps=eps, exclude=("of_flow",)),
        optax.adam(learning_rate),
    )


def _create_state(model, variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        opt_state=tx.init(variables["params"]),
        apply_fn=model.apply,
        tx=tx,
        quant_stats=variables.get("quant_stats", core.FrozenDict()),
    )


def _model_variables(state: TrainState, params) -> dict:
    v = {"params": params, "batch_stats": state.batch_stats}
    if state.quant_stats:
        v["quant_stats"] = state.quant_stats
    return v


def _mutable_for(state: TrainState) -> list:
    return (["batch_stats", "quant_stats"] if state.quant_stats
            else ["batch_stats"])


def _merge_mutated(state: TrainState, mut) -> TrainState:
    state = state.replace(batch_stats=mut["batch_stats"])
    if "quant_stats" in mut:
        state = state.replace(quant_stats=mut["quant_stats"])
    return state


def create_flow_train_state(model, variables,
                            tx: optax.GradientTransformation | None = None,
                            learning_rate=1e-4) -> TrainState:
    if tx is None:
        tx = default_optimizer(learning_rate)
    return _create_state(model, variables, tx)


create_interp_train_state = create_flow_train_state


def make_flow_train_step(l2_gamma: float = 4e-6):
    """Supervised-flow train step. batch = {'ims': (B,H,W,6) f32 in
    [-0.5, 0.5], 'flo': (B,H,W,2)}. Returns (state, metrics)."""

    def train_step(state: TrainState, batch) -> tuple[TrainState, dict]:
        def loss_fn(params):
            outs, mut = state.apply_fn(
                _model_variables(state, params),
                batch["ims"],
                train=True,
                mutable=_mutable_for(state),
            )
            loss = multiscale_flow_loss(batch["flo"], outs)
            loss = loss + l2_regularization(params, l2_gamma)
            return loss, (mut, outs)

        (loss, (mut, outs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads)
        state = _merge_mutated(state, mut)
        metrics = {
            "loss": loss,
            "epe": epe_error(batch["flo"], outs[-1]),
        }
        return state, metrics

    return train_step


def make_interp_train_step(l2_gamma: float = 4e-6):
    """Frame-interpolation pretraining step. batch = {'ims': (B,H,W,6)
    concat of frames 0 and 2, 'mid': (B,H,W,3) frame 1}; loss over ALL
    multiscale outputs (pre_train.py:54-72)."""

    def train_step(state: TrainState, batch) -> tuple[TrainState, dict]:
        def loss_fn(params):
            outs, mut = state.apply_fn(
                _model_variables(state, params),
                batch["ims"],
                train=True,
                mutable=_mutable_for(state),
            )
            loss, per_scale = multiscale_interp_loss(batch["mid"], outs)
            loss = loss + l2_regularization(params, l2_gamma)
            return loss, (mut, per_scale)

        (loss, (mut, per_scale)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        state = state.apply_gradients(grads)
        state = _merge_mutated(state, mut)
        metrics = {"loss": loss, **per_scale}
        return state, metrics

    return train_step


def recalibrate_batch_stats(state: TrainState, batches, n_passes: int = 200):
    """Re-estimate BatchNorm running statistics with forward passes.

    Why: the reference's OptFlow BatchNorm (momentum .99, eps 1e-3) sits
    on features whose variance can be eps-dominated; at inference the
    running MEANS then lag the deployment distribution and the
    (x - mean)/sqrt(var + eps) transform amplifies the drift ~30x —
    measured synthetic EPE 5.5 (batch stats) vs 328 (stale running
    stats) on a trained checkpoint, recovering to 7.5 after
    recalibration. Standard BN re-estimation: run train-mode forwards,
    mutating ONLY batch_stats (weights and quant ranges untouched).

    batches: iterable of input arrays ('ims'); consumed up to n_passes.
    """
    # Quantized models: apply(train=True) propagates update_stats=True
    # into QConv/ActQuant, which then WRITE their amax EMAs — so
    # 'quant_stats' must be declared mutable or flax raises
    # ModifyScopeVariableError. The mutated quant_stats are DISCARDED
    # below (only batch_stats is kept), preserving the calibrated
    # ranges as documented.
    apply = jax.jit(
        lambda bs, x: state.apply_fn(
            {"params": state.params, "batch_stats": bs,
             **({"quant_stats": state.quant_stats}
                if state.quant_stats else {})},
            x, train=True,
            mutable=(["batch_stats", "quant_stats"] if state.quant_stats
                     else ["batch_stats"]),
        )[1]["batch_stats"]
    )
    bs = state.batch_stats
    for i, ims in enumerate(batches):
        if i >= n_passes:
            break
        bs = apply(bs, ims)
    return state.replace(batch_stats=bs)
