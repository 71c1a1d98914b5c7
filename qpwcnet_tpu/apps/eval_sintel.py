"""Sintel EPE evaluation (the BASELINE.json quality gate: Sintel-clean
EPE; the reference never published a number — this app produces ours).

Run: python -m qpwcnet_tpu.apps.eval_sintel --data-path 'shards/*.tfrecord'
"""

from __future__ import annotations

import dataclasses
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

from qpwcnet_tpu.utils.config import with_args


@dataclasses.dataclass
class Settings:
    data_path: str = ""       # sintel shard glob or directory root
    load_ckpt: str = ""
    limit: int = 0            # 0 = all
    protocol: str = "pad"     # 'pad' (standard) | 'resize'
    height: int = 448         # resize protocol only
    width: int = 1024         # resize protocol only
    # BN running-statistic re-estimation passes over the eval inputs
    # before scoring (train.recalibrate_batch_stats): checkpoints whose
    # OptFlow BN running means lag the eval distribution lose hundreds
    # of px of EPE in inference mode (RESULTS.md). 0 disables.
    recalibrate: int = 100


@with_args(Settings)
def main(cfg: Settings):
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.ops.resize import resize_bilinear
    from qpwcnet_tpu.train import create_flow_train_state, epe_error
    from qpwcnet_tpu.train.checkpoint import CheckpointManager

    model, variables = build_flow_net(jax.random.key(0))
    if cfg.load_ckpt:
        state = create_flow_train_state(model, variables)
        mgr = CheckpointManager(cfg.load_ckpt)
        state = mgr.restore(state)
        mgr.close()
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    from pathlib import Path

    def make_source():
        if Path(cfg.data_path).is_dir():
            from qpwcnet_tpu.data.sintel import sintel_dir_iterator

            return sintel_dir_iterator(cfg.data_path)
        from qpwcnet_tpu.data.sintel import sintel_tfrecord_iterator

        return sintel_tfrecord_iterator(cfg.data_path)

    def pad32(ims):
        h0, w0 = ims.shape[1:3]
        return jnp.pad(ims, ((0, 0), (0, -(-h0 // 32) * 32 - h0),
                             (0, -(-w0 // 32) * 32 - w0), (0, 0)))

    if cfg.load_ckpt and cfg.recalibrate:
        recal = jax.jit(lambda bs, x: model.apply(
            {"params": variables["params"], "batch_stats": bs},
            x, train=True, mutable=["batch_stats"])[1]["batch_stats"])
        bs = variables["batch_stats"]
        for i, (ims_u8, _) in enumerate(make_source()):
            if i >= cfg.recalibrate:
                break
            # Recalibrate on the SAME preprocessing the selected eval
            # protocol uses — re-estimated running stats from a different
            # input resolution/distribution would defeat the purpose.
            ims = jnp.asarray(ims_u8[None].astype(np.float32) / 255.0)
            if cfg.protocol == "pad":
                x = pad32(ims) - 0.5
            else:
                x = resize_bilinear(ims, (cfg.height, cfg.width)) - 0.5
            bs = recal(bs, x)
        variables = {"params": variables["params"], "batch_stats": bs}
        print(f"recalibrated BN stats over {cfg.recalibrate} frames",
              file=sys.stderr)

    @jax.jit
    def forward(ims):
        return model.apply(variables, ims, train=False)

    source = make_source()

    epes = []
    for i, (ims_u8, flo_gt) in enumerate(source):
        if cfg.limit and i >= cfg.limit:
            break
        h0, w0 = ims_u8.shape[:2]
        ims = jnp.asarray(ims_u8[None].astype(np.float32) / 255.0)
        if cfg.protocol == "pad":
            # Standard Sintel protocol: zero-pad the 436x1024 native
            # frames up to the model's /32 shape (448x1024), run at
            # native scale, crop the prediction back — flow magnitudes
            # are untouched (no resize-and-rescale distortion).
            hp = -(-h0 // 32) * 32
            wp = -(-w0 // 32) * 32
            ims = jnp.pad(
                ims, ((0, 0), (0, hp - h0), (0, wp - w0), (0, 0)))
            flo_full = forward(ims - 0.5)[:, :h0, :w0]
        else:
            ims = resize_bilinear(ims, (cfg.height, cfg.width)) - 0.5
            flo = forward(ims)
            # upsample pred back to original resolution + rescale
            flo_full = resize_bilinear(flo, (h0, w0)) * jnp.asarray(
                [w0 / cfg.width, h0 / cfg.height])
        epe = float(epe_error(jnp.asarray(flo_gt[None]), flo_full))
        epes.append(epe)
        if (i + 1) % 50 == 0:
            print(f"{i + 1}: running EPE {np.mean(epes):.3f}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "sintel EPE",
        "value": float(np.mean(epes)) if epes else None,
        "n": len(epes),
        "protocol": cfg.protocol,
    }))


if __name__ == "__main__":
    main()
