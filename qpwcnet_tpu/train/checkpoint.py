"""Checkpoint/resume via Orbax + cross-model weight transfer
(SURVEY.md §5 'Checkpoint / resume').

Replaces the reference's three mechanisms — Keras ModelCheckpoint
(train.py:320-321), tf.train.CheckpointManager(max_to_keep=8)
(train.py:422-427), and the fragile SavedModel->HDF5-subprocess by-name
weight transfer (train/util.py:23-54) — with:

  * :class:`CheckpointManager` — Orbax-backed save/restore of the full
    TrainState pytree (params + batch_stats + opt_state + step),
    max_to_keep=8, auto-resume from latest;
  * :func:`transfer_params` — pretrain->flow transfer by param SUBTREE
    ('encoder', 'decoder', 'flower'), robust by construction (the
    reference demands exact build order, pwcnet.py:276-279).
"""

from __future__ import annotations

from pathlib import Path
from typing import Sequence

import jax
import orbax.checkpoint as ocp

TRANSFER_SUBTREES = ("encoder", "decoder", "flower")


class CheckpointManager:
    """Orbax CheckpointManager for TrainState pytrees."""

    def __init__(self, directory, max_to_keep: int = 8):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state) -> None:
        self._mgr.save(
            step, args=ocp.args.StandardSave(_to_save(state))
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state, step: int | None = None):
        """Restore into the structure of `state` (a template TrainState);
        returns the updated state or the template if no checkpoint."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return state
        # Restore to HOST arrays (ShapeDtypeStruct template with no
        # sharding -> numpy): restoring straight onto the device issues
        # one transfer per leaf, which costs ~10 minutes through the
        # axon remote tunnel (~600 leaves x ~1 s round trip). The host
        # arrays move to the device in a handful of batched transfers at
        # first use instead.
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp_shape(x), x.dtype),
            _to_save(state),
        )
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except (KeyError, ValueError) as e:
            if "quant_stats" not in template:
                raise
            # QAT state restoring a FLOAT checkpoint (e.g. starting a
            # QAT fine-tune from a float training run): the checkpoint
            # has no quant_stats subtree — restore everything else and
            # keep the template's fresh (zero) ranges.
            template.pop("quant_stats")
            try:
                restored = self._mgr.restore(
                    step, args=ocp.args.StandardRestore(template)
                )
            except Exception:
                raise e from None
        state = state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"],
        )
        if "quant_stats" in restored:
            state = state.replace(quant_stats=restored["quant_stats"])
        return state

    def restore_params(self, state, step: int | None = None):
        """Restore only params/batch_stats/step (Orbax partial restore),
        ignoring the checkpoint's opt_state entirely.

        Use when the restoring run's optimizer differs from the saving
        run's (e.g. evaluating a checkpoint trained with the plain-Adam
        synthetic recipe from an app that builds the reference AGC
        chain): :meth:`restore` would fail on the opt_state structure
        mismatch. Returns the template `state` untouched if no
        checkpoint exists."""
        if step is None:
            step = self.latest_step()
        if step is None:
            return state
        full = _to_save(state)
        template = {
            k: jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(jnp_shape(x), x.dtype),
                full[k],
            )
            for k in ("params", "batch_stats", "step")
        }
        # PyTreeRestore cannot share a manager whose 'default' item is
        # already bound to Standard* handlers (save/restore above), so
        # partial restores go through a short-lived manager.
        mgr = ocp.CheckpointManager(self.directory)
        try:
            restored = mgr.restore(
                step,
                args=ocp.args.PyTreeRestore(
                    item=template, partial_restore=True
                ),
            )
        finally:
            mgr.close()
        return state.replace(
            step=restored["step"],
            params=restored["params"],
            batch_stats=restored["batch_stats"],
        )

    def close(self):
        self._mgr.close()


def jnp_shape(x):
    return getattr(x, "shape", ())


def _to_save(state) -> dict:
    out = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    # QAT runs MUST persist their calibrated activation ranges — losing
    # quant_stats across an interrupt/resume silently destroys the int8
    # deployment quality. Included only when non-empty (float states
    # keep their round-1/2 checkpoint structure, and Orbax rejects
    # empty subtrees).
    if state.quant_stats:
        out["quant_stats"] = state.quant_stats
    return out


def transfer_params(
    src_params,
    dst_params,
    subtrees: Sequence[str] = TRANSFER_SUBTREES,
):
    """Copy shared subtrees (encoder/decoder/flower) from src into dst —
    the pretrain->supervised transfer (train/util.py:23-54 equivalent).
    Shapes must match; raises otherwise."""
    dst = dict(dst_params)
    for name in subtrees:
        if name not in src_params or name not in dst_params:
            raise KeyError(f"transfer subtree {name!r} missing")
        src_shapes = jax.tree_util.tree_map(
            lambda x: x.shape, src_params[name])
        dst_shapes = jax.tree_util.tree_map(
            lambda x: x.shape, dst_params[name])
        if src_shapes != dst_shapes:
            raise ValueError(f"shape mismatch in subtree {name!r}")
        dst[name] = src_params[name]
    return type(dst_params)(dst) if not isinstance(dst_params, dict) else dst
