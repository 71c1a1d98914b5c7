"""Interpolator inference / visualization (parity with
qpwcnet/app/frame_interpolation/pre_train_test.py): run the
frame-interpolation model on triplets, save predicted middle frames, the
extracted bidirectional flows (rendered RGB), and the warp sanity check
(pre_train_test.py:136-148: warp the next frame by the upsampled
half-flow and compare to the middle frame).

Where the reference fished the flow sub-model out of the Keras graph by
layer name ('lambda_11', pre_train_test.py:102-106), here the model
simply returns its flows (PWCInterpolator(..., return_flows=True)).

Run: python -m qpwcnet_tpu.apps.interp_infer --data dummy --n 1
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from qpwcnet_tpu.utils.config import with_args


@dataclasses.dataclass
class Settings:
    data: str = "dummy"       # 'dummy' | 'vimeo' | 'ytvos' | 'synthetic'
    data_path: str = ""
    load_ckpt: str = ""
    height: int = 256
    width: int = 512
    n: int = 2
    out_dir: str = "/tmp/qpwcnet_tpu/interp_infer"


def _save(path, arr01):
    from PIL import Image

    arr = np.clip(np.asarray(arr01) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


@with_args(Settings)
def main(cfg: Settings):
    from qpwcnet_tpu.data.pipeline import load_image
    from qpwcnet_tpu.models import build_interpolator
    from qpwcnet_tpu.ops import backward_warp, flow_to_image
    from qpwcnet_tpu.ops.resize import upsample2x_bilinear
    from qpwcnet_tpu.train import create_interp_train_state
    from qpwcnet_tpu.train.checkpoint import CheckpointManager

    out_dir = Path(cfg.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    model, variables = build_interpolator(
        jax.random.key(0), (cfg.height, cfg.width))
    if cfg.load_ckpt:
        state = create_interp_train_state(model, variables)
        mgr = CheckpointManager(cfg.load_ckpt)
        state = mgr.restore(state)
        mgr.close()
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    @jax.jit
    def forward(ims):
        return model.apply(variables, ims, train=False,
                           return_flows=True)

    if cfg.data == "synthetic":
        rng = np.random.RandomState(0)
        triplets = (
            tuple(
                rng.uniform(0, 1, (cfg.height, cfg.width, 3)).astype(
                    np.float32)
                for _ in range(3)
            )
            for _ in range(cfg.n)
        )
    else:
        from qpwcnet_tpu.data.triplet import (
            DummyTripletDataset, VimeoTriplet, YoutubeVos)

        if cfg.data == "vimeo":
            ds = VimeoTriplet(cfg.data_path, "test")
        elif cfg.data == "ytvos":
            ds = YoutubeVos(cfg.data_path, "valid")
        else:
            ds = DummyTripletDataset(n=cfg.n,
                                     hw=(cfg.height, cfg.width))

        def gen():
            for k in list(ds.keys())[:cfg.n]:
                p0, p1, p2 = ds[k]
                yield tuple(
                    load_image(p, (cfg.height, cfg.width)).astype(
                        np.float32) / 255.0
                    for p in (p0, p1, p2)
                )

        triplets = gen()

    for i, (f0, f1, f2) in enumerate(triplets):
        ims = jnp.asarray(
            np.concatenate([f0, f2], axis=-1)[None] - 0.5)
        pred, (flos_01, flos_10) = forward(ims)
        mid_pred = np.asarray(pred[0] + 0.5)

        _save(out_dir / f"{i:03d}_frame0.png", f0)
        _save(out_dir / f"{i:03d}_mid_pred.png", mid_pred)
        _save(out_dir / f"{i:03d}_mid_true.png", f1)
        _save(out_dir / f"{i:03d}_frame2.png", f2)
        _save(out_dir / f"{i:03d}_flow01.png",
              flow_to_image(flos_01[-1][0]))
        _save(out_dir / f"{i:03d}_flow10.png",
              flow_to_image(flos_10[-1][0]))

        # warp sanity check (pre_train_test.py:136-148): warp frame2 by
        # the 2x-nearest-upsampled half flow, compare to the middle frame.
        flo_u = upsample2x_bilinear(flos_01[-2], scale=2.0)
        f2_w = backward_warp(jnp.asarray(f2[None]), 0.5 * flo_u)[0]
        _save(out_dir / f"{i:03d}_frame2_halfwarp.png", np.asarray(f2_w))
        l1 = float(jnp.mean(jnp.abs(f2_w - jnp.asarray(f1))))
        psnr = -10 * np.log10(
            float(jnp.mean((pred[0] + 0.5 - jnp.asarray(f1)) ** 2))
            + 1e-12)
        print(f"[{i}] interp PSNR={psnr:.2f} dB, half-warp L1={l1:.4f}",
              file=sys.stderr)
    print(f"wrote {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
