"""Flow inference / visualization app (parity with
qpwcnet/app/optical_flow/test_infer.py and the warp-validation overlay it
renders). Headless: writes PNGs instead of OpenCV windows
(the reference's vis/show.py role is filled by PIL file output).

Run: python -m qpwcnet_tpu.apps.infer --data synthetic --n 2
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
    data: str = "synthetic"    # 'synthetic' | 'sintel'
    data_path: str = ""        # sintel shard glob
    load_ckpt: str = ""        # run ckpt dir
    height: int = 256
    width: int = 512
    n: int = 4                 # number of examples
    out_dir: str = "/tmp/qpwcnet_tpu/infer"
    # Measured-fastest TPU inference config (round 5, DESIGN.md):
    # bf16 compute + fused Pallas encoder stem (exact semantics) +
    # fused warp+correlate at the finest level (window-warp
    # approximation there). 151.8 vs 113.0 pairs/s at 448x1024 b8.
    fast: bool = False


def _save(path, arr01):
    from PIL import Image

    arr = np.clip(np.asarray(arr01) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


@with_args(Settings)
def main(cfg: Settings):
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.ops import backward_warp, flow_to_image
    from qpwcnet_tpu.ops.resize import resize_bilinear
    from qpwcnet_tpu.train import create_flow_train_state
    from qpwcnet_tpu.train.checkpoint import CheckpointManager

    out_dir = Path(cfg.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    fast_kw = {}
    if cfg.fast:
        if jax.default_backend() == "tpu":
            fast_kw = dict(dtype=jnp.bfloat16, cv_impl="fast",
                           stem_stages=2)
        else:
            print("--fast ignored off-TPU (the Pallas kernels would "
                  "run in interpret mode)", file=sys.stderr)
    model, variables = build_flow_net(
        jax.random.key(0), (cfg.height, cfg.width), **fast_kw)
    if cfg.load_ckpt:
        state = create_flow_train_state(model, variables)
        mgr = CheckpointManager(cfg.load_ckpt)
        state = mgr.restore(state)
        mgr.close()
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}

    @jax.jit
    def forward(ims):
        return model.apply(variables, ims, train=False)

    if cfg.data == "sintel":
        from qpwcnet_tpu.data.sintel import sintel_tfrecord_iterator

        source = sintel_tfrecord_iterator(cfg.data_path)
    else:
        rng = np.random.RandomState(0)

        def synth():
            for _ in range(cfg.n):
                ims = rng.randint(
                    0, 255, (cfg.height, cfg.width, 6), np.uint8)
                flo = np.tile(
                    rng.uniform(-6, 6, (1, 1, 2)).astype(np.float32),
                    (cfg.height, cfg.width, 1))
                yield ims, flo

        source = synth()

    for i, (ims_u8, flo_gt) in enumerate(source):
        if i >= cfg.n:
            break
        ims = jnp.asarray(ims_u8[None].astype(np.float32) / 255.0)
        if ims.shape[1:3] != (cfg.height, cfg.width):
            scale = jnp.asarray(
                [cfg.width / ims.shape[2], cfg.height / ims.shape[1]])
            ims = resize_bilinear(ims, (cfg.height, cfg.width))
            flo_gt = np.asarray(resize_bilinear(
                jnp.asarray(flo_gt[None]),
                (cfg.height, cfg.width))[0] * scale)
        flo = forward(ims - 0.5)[0]

        prv, nxt = ims[0, ..., :3], ims[0, ..., 3:]
        nxt_w = backward_warp(nxt[None], flo[None])[0]

        _save(out_dir / f"{i:03d}_prv.png", prv)
        _save(out_dir / f"{i:03d}_nxt.png", nxt)
        _save(out_dir / f"{i:03d}_nxt_warped.png", nxt_w)
        _save(out_dir / f"{i:03d}_flow.png", flow_to_image(flo))
        _save(out_dir / f"{i:03d}_flow_gt.png",
              flow_to_image(jnp.asarray(flo_gt)))
        warp_err = float(jnp.mean(jnp.abs(nxt_w - prv)))
        print(f"[{i}] warp-validation L1={warp_err:.4f}", file=sys.stderr)
    print(f"wrote {out_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
