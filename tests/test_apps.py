"""End-to-end app smoke tests (slow: each compiles a full model on the
1-core CPU test platform). Mirror the reference's entry points:
train (synthetic), pretrain (dummy triplets), infer, quant export.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


@pytest.mark.slow
def test_train_flow_synthetic(tmp_path):
    from qpwcnet_tpu.apps.train_flow import main

    main([
        "--data", "synthetic", "--steps", "3", "--batch-size", "2",
        "--height", "32", "--width", "64", "--log-every", "1",
        "--ckpt-every", "2", "--run-root", str(tmp_path / "run"),
    ])
    run = tmp_path / "run" / "000"
    assert (run / "config.json").exists()
    assert (run / "log" / "metrics.jsonl").exists()
    assert any((run / "ckpt").iterdir())


@pytest.mark.slow
def test_pretrain_interp_dummy(tmp_path):
    from qpwcnet_tpu.apps.pretrain_interp import main

    main([
        "--data", "dummy", "--steps", "2", "--batch-size", "2",
        "--height", "32", "--width", "64", "--log-every", "1",
        "--ckpt-every", "2", "--run-root", str(tmp_path / "pre"),
    ])
    run = tmp_path / "pre" / "000"
    assert (run / "log" / "metrics.jsonl").exists()


@pytest.mark.slow
def test_infer_synthetic(tmp_path):
    from qpwcnet_tpu.apps.infer import main

    main([
        "--data", "synthetic", "--n", "1",
        "--height", "32", "--width", "64",
        "--out-dir", str(tmp_path / "out"),
    ])
    out = tmp_path / "out"
    assert (out / "000_flow.png").exists()
    assert (out / "000_nxt_warped.png").exists()


@pytest.mark.slow
def test_convert_quant(tmp_path):
    from qpwcnet_tpu.apps.convert_quant import main

    bundle = tmp_path / "m.npz"
    main([
        "--steps", "1", "--height", "32", "--width", "64",
        "--out", str(bundle), "--check", "false",
    ])
    assert bundle.exists()


@pytest.mark.slow
def test_eval_sintel_pad_protocol(tmp_path):
    """eval_sintel runs the standard pad-to-/32 protocol on a fake
    Sintel tree at native (non-multiple-of-32) resolution and reports a
    finite EPE."""
    import json

    import numpy as np
    from PIL import Image

    from qpwcnet_tpu.apps.eval_sintel import main
    from qpwcnet_tpu.data.flo_format import write_flo

    seq = tmp_path / "training" / "final" / "alley_1"
    flo_dir = tmp_path / "training" / "flow" / "alley_1"
    seq.mkdir(parents=True)
    flo_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    h, w = 36, 64  # not multiples of 32 -> exercises the padding
    for i in (1, 2):
        Image.fromarray(
            rng.randint(0, 255, (h, w, 3), np.uint8)
        ).save(seq / f"frame_{i:04d}.png")
    write_flo(flo_dir / "frame_0001.flo",
              np.ones((h, w, 2), np.float32))

    import contextlib
    import io as _io

    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        main(["--data-path", str(tmp_path)])
    out = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert out["n"] == 1 and out["protocol"] == "pad"
    assert np.isfinite(out["value"])


@pytest.mark.slow
def test_pretrain_transfer_to_flow(tmp_path):
    """The reference's flagship workflow at the APPS level (pre_train.py
    -> train.py load_weights, reference README.md:38): pretrain the
    interpolator on synthetic triplets, then start supervised flow
    training from it via --transfer-from-interp. With lr=0 the flow
    run's encoder/decoder/flower params must equal the pretrained ones
    bit-exactly — proving the wiring, not just transfer_params."""
    import jax
    import numpy as np

    from qpwcnet_tpu.apps.pretrain_interp import main as pretrain_main
    from qpwcnet_tpu.apps.train_flow import main as train_main

    pretrain_main([
        "--data", "synthetic", "--steps", "2", "--batch-size", "2",
        "--height", "32", "--width", "64", "--log-every", "1",
        "--ckpt-every", "10", "--steps-per-call", "2",
        "--recalibrate-final", "1", "--max-disp", "4",
        "--head-scale", "diag", "--residual", "false",
        "--run-root", str(tmp_path / "pre"),
    ])
    train_main([
        "--data", "synthetic", "--steps", "1", "--batch-size", "2",
        "--height", "32", "--width", "64", "--log-every", "1",
        "--ckpt-every", "10", "--steps-per-call", "1",
        "--curriculum", "", "--learning-rate", "0",
        "--recalibrate-final", "0", "--max-disp", "4",
        "--head-scale", "diag", "--residual", "false",
        "--load-ckpt", str(tmp_path / "pre" / "000" / "ckpt"),
        "--transfer-from-interp", "true",
        "--run-root", str(tmp_path / "flow"),
    ])

    from qpwcnet_tpu.models import build_flow_net, build_interpolator
    from qpwcnet_tpu.train import create_flow_train_state
    from qpwcnet_tpu.train.checkpoint import (
        CheckpointManager, TRANSFER_SUBTREES)

    # restore_params: the apps pick their optimizer per-run ('auto'
    # resolves differently for pretrain vs the lr=0 flow run), so the
    # full-TrainState restore would fail on opt_state structure.
    imodel, ivars = build_interpolator(jax.random.key(0), (32, 64))
    imgr = CheckpointManager(tmp_path / "pre" / "000" / "ckpt")
    istate = imgr.restore_params(create_flow_train_state(imodel, ivars))
    imgr.close()

    fmodel, fvars = build_flow_net(jax.random.key(0), (32, 64))
    fmgr = CheckpointManager(tmp_path / "flow" / "000" / "ckpt")
    fstate = fmgr.restore_params(create_flow_train_state(fmodel, fvars))
    fmgr.close()

    for name in TRANSFER_SUBTREES:
        fa = jax.tree_util.tree_leaves(istate.params[name])
        fb = jax.tree_util.tree_leaves(fstate.params[name])
        assert len(fa) == len(fb) and len(fa) > 0
        for la, lb in zip(fa, fb):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@pytest.mark.slow
def test_train_flow_qat_interrupt_resume(tmp_path):
    """QAT as a first-class resumable mode (VERDICT r2 #2): a QAT run
    checkpoints its quant_stats; interrupt + resume reproduces the same
    int8 bundle as an uninterrupted run of the same length."""
    import numpy as np

    from qpwcnet_tpu.apps.train_flow import main

    common = [
        "--data", "synthetic", "--batch-size", "2",
        "--height", "32", "--width", "64", "--log-every", "10",
        "--qat", "true", "--augment", "off",
    ]
    # uninterrupted: 4 steps
    main([*common, "--steps", "4", "--ckpt-every", "100",
          "--run-root", str(tmp_path / "a")])
    # interrupted: 2 steps, then resume to 4
    main([*common, "--steps", "2", "--ckpt-every", "100",
          "--run-root", str(tmp_path / "b")])
    main([*common, "--steps", "4", "--ckpt-every", "100",
          "--run-root", str(tmp_path / "b2"),
          "--load-ckpt", str(tmp_path / "b" / "000" / "ckpt")])

    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.quantize import QuantConfig
    from qpwcnet_tpu.quantize.int8 import convert_to_int8
    from qpwcnet_tpu.train import create_flow_train_state
    from qpwcnet_tpu.train.checkpoint import CheckpointManager

    import jax

    def load(run_root):
        from qpwcnet_tpu.apps.train_flow import _make_tx

        model, variables = build_flow_net(
            jax.random.key(0), (32, 64), quant=QuantConfig())
        # Restore with the SAME optimizer chain the app used (synthetic
        # mode resolves to the 'plain' 2-element chain) — orbax rejects
        # an opt_state structure mismatch against the on-disk tree.
        state = create_flow_train_state(model, variables,
                                        tx=_make_tx("plain", 1e-4))
        mgr = CheckpointManager(Path(run_root) / "000" / "ckpt")
        state = mgr.restore(state)
        mgr.close()
        return state

    sa = load(tmp_path / "a")
    sb = load(tmp_path / "b2")
    assert int(sa.step) == 4 and int(sb.step) == 4
    # calibrated ranges survived the interrupt: non-zero and identical
    # (ravel: amax_in is a per-channel vector on concat consumers)
    qa = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(sa.quant_stats)])
    qb = np.concatenate([np.ravel(x) for x in
                         jax.tree_util.tree_leaves(sb.quant_stats)])
    assert float(np.max(qa)) > 0
    np.testing.assert_allclose(qa, qb, rtol=1e-6)
    # identical int8 deployment bundles
    ba = convert_to_int8(sa.params, sa.quant_stats)
    bb = convert_to_int8(sb.params, sb.quant_stats)
    assert ba.keys() == bb.keys()
    for k in ba:
        np.testing.assert_array_equal(ba[k].kernel_i8, bb[k].kernel_i8)
        np.testing.assert_allclose(ba[k].in_amax, bb[k].in_amax,
                                   rtol=1e-6)
