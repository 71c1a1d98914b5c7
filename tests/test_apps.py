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
