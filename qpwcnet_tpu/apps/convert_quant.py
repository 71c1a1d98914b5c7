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
    # EPE-delta gate: load a trained FLOAT checkpoint, calibrate
    # activation ranges with forward passes (weights untouched), then
    # compare float vs int8 EPE on synthetic known-flow batches.
    float_ckpt: str = ""
    gate_batches: int = 4
    gate_batch_size: int = 4
    calib_passes: int = 200    # BN + activation-range calibration passes
    qat_steps: int = 300       # QAT fine-tune steps before conversion
    qat_lr: float = 3e-5


def _epe_gate(cfg, state, quant):
    """Quantized-vs-float EPE delta on a TRAINED checkpoint (the
    deployment quality gate the reference's TFLite path never had).

    Calibration is forward-only: QAT-mode applies with
    mutable=['quant_stats'] populate the activation-range EMAs while
    leaving weights and BN statistics untouched.
    """
    import json

    from qpwcnet_tpu.apps.train_flow import Settings as TrainSettings
    from qpwcnet_tpu.apps.train_flow import _synthetic_batches
    from qpwcnet_tpu.models import PWCFlowNet
    from qpwcnet_tpu.train.losses import epe_error

    gen = _synthetic_batches(TrainSettings(
        batch_size=cfg.gate_batch_size, height=cfg.height,
        width=cfg.width, seed=123))

    def next_batch():
        ims_u8, flo = next(gen)
        return (jnp.asarray(ims_u8, jnp.float32) / 255.0 - 0.5,
                jnp.asarray(flo))

    # Snapshot the original float weights: the float baseline must be
    # evaluated with THESE — QAT fine-tuning adapts weights to input
    # quantization, which degrades their float-mode quality (measured
    # 5.3 -> 34 EPE), so "float = post-QAT params" is the wrong baseline.
    float_params = state.params
    float_bstats = state.batch_stats

    if cfg.qat_steps:
        # QAT fine-tune from the float weights (the reference pipeline:
        # train float -> quantize_apply -> fit; convert_tflite.py:198-205).
        # A float checkpoint converted directly loses badly (measured
        # 2.6x EPE): the OptFlow features are small-variance and the
        # per-tensor activation scales crush them below one quantization
        # step until QAT re-spreads them.
        from qpwcnet_tpu.train import (
            create_flow_train_state as cfts, make_flow_train_step)
        from qpwcnet_tpu.train.train_state import default_optimizer

        state = cfts(
            PWCFlowNet(quant=quant),
            {"params": state.params, "batch_stats": state.batch_stats,
             "quant_stats": state.quant_stats},
            tx=default_optimizer(cfg.qat_lr))
        qat_step = jax.jit(make_flow_train_step())
        for i in range(cfg.qat_steps):
            ims, flo = next_batch()
            state, metrics = qat_step(state, {"ims": ims, "flo": flo})
            if (i + 1) % 100 == 0:
                print(f"qat step {i + 1}: "
                      f"loss={float(metrics['loss']):.4f} "
                      f"epe={float(metrics['epe']):.2f}",
                      file=sys.stderr)

    # Joint calibration: activation-range EMAs for int8 AND BatchNorm
    # running-statistic re-estimation (see
    # train.train_state.recalibrate_batch_stats — stale running means
    # cost 300+ px of synthetic EPE on this checkpoint).
    qat_model = PWCFlowNet(quant=quant)
    qs, bs = state.quant_stats, state.batch_stats
    calibrate = jax.jit(lambda v, x: qat_model.apply(
        v, x, train=True, mutable=["quant_stats", "batch_stats"])[1])
    for _ in range(cfg.calib_passes):
        ims, _flo = next_batch()
        mut = calibrate(
            {"params": state.params, "batch_stats": bs,
             "quant_stats": qs}, ims)
        qs, bs = mut["quant_stats"], mut["batch_stats"]
    state = state.replace(quant_stats=qs, batch_stats=bs)

    int8_model = PWCFlowNet(
        dtype=jnp.bfloat16,
        quant=dataclasses.replace(quant, mode="int8"))
    float_model = PWCFlowNet(dtype=jnp.bfloat16)

    # BN re-estimation for the float baseline on its own (original)
    # weights over the eval distribution.
    recal_f = jax.jit(lambda bs, x: float_model.apply(
        {"params": float_params, "batch_stats": bs},
        x, train=True, mutable=["batch_stats"])[1]["batch_stats"])
    for _ in range(cfg.calib_passes):
        ims, _flo = next_batch()
        float_bstats = recal_f(float_bstats, ims)

    run_q = jax.jit(lambda x: int8_model.apply(
        {"params": state.params, "batch_stats": state.batch_stats,
         "quant_stats": state.quant_stats}, x, train=False))
    run_f = jax.jit(lambda x: float_model.apply(
        {"params": float_params, "batch_stats": float_bstats},
        x, train=False))

    epes_f, epes_q = [], []
    for _ in range(cfg.gate_batches):
        ims_u8, flo = next(gen)
        ims = jnp.asarray(ims_u8, jnp.float32) / 255.0 - 0.5
        flo = jnp.asarray(flo)
        epes_f.append(float(epe_error(flo, run_f(ims))))
        epes_q.append(float(epe_error(flo, run_q(ims))))
    epe_f = float(np.mean(epes_f))
    epe_q = float(np.mean(epes_q))
    rel = (epe_q - epe_f) / max(epe_f, 1e-9)
    print(json.dumps({
        "metric": "int8-vs-float EPE delta (trained ckpt, synthetic)",
        "epe_float": round(epe_f, 4),
        "epe_int8": round(epe_q, 4),
        "rel_delta": round(rel, 4),
    }))
    return state


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

    if cfg.float_ckpt:
        # trained float run: identical param tree (QConv owns the same
        # 'kernel'/'bias' names with or without quant), no quant_stats.
        from qpwcnet_tpu.models import build_flow_net as bfn

        fmodel, fvars = bfn(jax.random.key(0),
                            (cfg.height, cfg.width))
        fstate = create_flow_train_state(fmodel, fvars)
        mgr = CheckpointManager(cfg.float_ckpt)
        fstate = mgr.restore(fstate)
        mgr.close()
        state = state.replace(params=fstate.params,
                              batch_stats=fstate.batch_stats)
        state = _epe_gate(cfg, state, quant)
    elif cfg.load_ckpt:
        mgr = CheckpointManager(cfg.load_ckpt)
        state = mgr.restore(state)
        mgr.close()
    if not max(
        (float(jnp.max(x))
         for x in jax.tree_util.tree_leaves(state.quant_stats)),
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
