"""QAT -> int8 deployment export (parity with
qpwcnet/app/quantize/convert_tflite.py + test_infer_tflite.py).

Where the reference annotates a Keras graph with tfmot, applies fake
quant, and emits a TFLite flatbuffer, here the deployment artifact is:
  * an int8 weight bundle (.npz: int8 kernels + per-channel scales +
    QAT activation ranges) via quantize.int8.save_int8_bundle, and
  * a jitted int8-executing inference function (QuantConfig(mode='int8'))
    whose StableHLO can additionally be exported with jax.export.

The --check step mirrors test_infer_tflite.py: runs the int8 model on
random inputs and reports the output delta vs the float model.

Run: python -m qpwcnet_tpu.apps.convert_quant --steps 3 --check true
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
    load_ckpt: str = ""        # QAT run ckpt dir ('' = fresh QAT on noise)
    steps: int = 3             # calibration QAT steps when no ckpt
    height: int = 256
    width: int = 512
    out: str = "/tmp/qpwcnet_tpu/qpwcnet_int8.npz"
    check: bool = True
    export_stablehlo: str = ""  # optional path for jax.export artifact


@with_args(Settings)
def main(cfg: Settings):
    from qpwcnet_tpu.models import PWCFlowNet, build_flow_net
    from qpwcnet_tpu.quantize import QuantConfig
    from qpwcnet_tpu.quantize.int8 import convert_to_int8, save_int8_bundle
    from qpwcnet_tpu.train import (
        create_flow_train_state, make_flow_train_step)
    from qpwcnet_tpu.train.checkpoint import CheckpointManager

    quant = QuantConfig()
    model, variables = build_flow_net(
        jax.random.key(0), (cfg.height, cfg.width), quant=quant)
    state = create_flow_train_state(model, variables)

    if cfg.load_ckpt:
        mgr = CheckpointManager(cfg.load_ckpt)
        state = mgr.restore(state)
        mgr.close()
    if not max(
        (float(x) for x in jax.tree_util.tree_leaves(state.quant_stats)),
        default=0.0,
    ):
        # no calibrated ranges yet: run a few QAT steps to populate them
        print(f"calibrating ranges with {cfg.steps} QAT steps",
              file=sys.stderr)
        step = jax.jit(make_flow_train_step())
        rng = np.random.RandomState(0)
        for _ in range(cfg.steps):
            batch = {
                "ims": jnp.asarray(rng.uniform(
                    -0.5, 0.5,
                    (1, cfg.height, cfg.width, 6)).astype(np.float32)),
                "flo": jnp.asarray(rng.uniform(
                    -4, 4,
                    (1, cfg.height, cfg.width, 2)).astype(np.float32)),
            }
            state, _ = step(state, batch)

    bundle = convert_to_int8(state.params, state.quant_stats)
    Path(cfg.out).parent.mkdir(parents=True, exist_ok=True)
    save_int8_bundle(cfg.out, bundle)
    n_int8 = sum(c.kernel_i8.size for c in bundle.values())
    print(f"wrote {cfg.out}: {len(bundle)} convs, "
          f"{n_int8 / 1e6:.2f}M int8 weights", file=sys.stderr)

    if cfg.check:
        int8_model = PWCFlowNet(
            quant=dataclasses.replace(quant, mode="int8"))
        float_model = PWCFlowNet()
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.uniform(
            -0.5, 0.5, (1, cfg.height, cfg.width, 6)).astype(np.float32))
        q_out = int8_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "quant_stats": state.quant_stats}, x, train=False)
        f_out = float_model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            x, train=False)
        err = float(jnp.mean(jnp.abs(q_out - f_out)))
        mag = float(jnp.mean(jnp.abs(f_out))) + 1e-9
        print(f"int8 vs float flow: mean|delta|={err:.4f} "
              f"({100 * err / mag:.1f}% of mean|flow|)", file=sys.stderr)

    if cfg.export_stablehlo:
        from jax import export as jexport

        int8_model = PWCFlowNet(
            quant=dataclasses.replace(quant, mode="int8"))

        def infer(x):
            return int8_model.apply(
                {"params": state.params,
                 "batch_stats": state.batch_stats,
                 "quant_stats": state.quant_stats}, x, train=False)

        exp = jexport.export(jax.jit(infer))(
            jax.ShapeDtypeStruct(
                (1, cfg.height, cfg.width, 6), jnp.float32))
        Path(cfg.export_stablehlo).write_bytes(exp.serialize())
        print(f"stablehlo -> {cfg.export_stablehlo}", file=sys.stderr)


if __name__ == "__main__":
    main()
