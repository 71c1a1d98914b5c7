"""Model structure tests: multiscale output shapes, closed-form parameter
counts (structural parity with the reference builders, pwcnet.py:210-287),
siamese weight sharing, and flow<->interpolator transferability.

Uses the session-scoped model fixtures from conftest (TEST_HW=(32, 64)) —
full-model CPU compiles are expensive on this host.
"""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from tests.conftest import TEST_HW

H, W = TEST_HW


def _n_params(tree):
    return sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(tree))


def _optflow_params(d_in):
    """Closed-form OptFlow trainable params (non_layers.py:213-273):
    4 separable convs (128/64/32/16) + 1x1 conv(16) + BN(scale,bias) +
    3x3 flow conv (2ch, no bias). SeparableConv(D->F) = 9D + DF + F."""
    total = 0
    d = d_in
    for f in (128, 64, 32, 16):
        total += 9 * d + d * f + f
        d = f
    total += 16 * 16 + 16       # 1x1 conv
    total += 2 * 16             # BN scale+bias
    total += 9 * 16 * 2         # flow conv
    return total


def _expected_flow_net_params():
    # Encoder: DownConv(F, C_in) = 9*C*F + 2*9*F*F + 3*F (pwcnet.py:145)
    enc = 0
    c = 3
    for f in (16, 32, 64, 128, 256):
        enc += 9 * c * f + 18 * f * f + 3 * f
        c = f
    # Decoder: UpConv = ConvTranspose 4x4: 16*C*F + F; inputs walk the
    # skip-concat chain (pwcnet.py:186-206).
    dec = 0
    dec_in = (256, 256, 128, 64)
    for c_in, f in zip(dec_in, (128, 64, 32, 16)):
        dec += 16 * c_in * f + f
    # Flower: Flow on concat[cost81, enc256, enc256]; UpFlows on
    # concat[cost81, dec_c, flo2] (layers.py:429,482).
    flower = _optflow_params(81 + 256 + 256)
    for c_dec in (256, 128, 64, 32):
        flower += _optflow_params(81 + c_dec + 2)
    return enc + dec + flower


def _expected_interp_params():
    # FrameInterpolate: SepConv(D->64) + 1x1 conv(64->3) (layers.py:356).
    def head(d_in):
        return 9 * d_in + 64 * d_in + 64 + (64 * 3 + 3)

    total = _expected_flow_net_params()
    total += head(3 + 3 + 2 + 2)  # img_0: warped images + 2 flows
    for c_dec in (256, 128, 64, 32):
        total += head(2 * c_dec + 2 + 2 + 3)  # warped decs + flows + img_u
    return total


def test_flow_net_multiscale_shapes(flow_setup):
    model, variables = flow_setup
    x = jnp.zeros((2, H, W, 6), jnp.float32)
    outs = model.apply(variables, x, train=True,
                       mutable=["batch_stats"])[0]
    assert len(outs) == 6  # 1/32..1/1 (pwcnet.py:39-61)
    for i, o in enumerate(outs):
        s = 32 // (2 ** i)
        assert o.shape == (2, H // s, W // s, 2), (i, o.shape)
        assert np.isfinite(np.asarray(o)).all()


def test_flow_net_inference_single_output(flow_setup):
    model, variables = flow_setup
    x = jnp.zeros((1, H, W, 6), jnp.float32)
    final = model.apply(variables, x, train=False)
    assert final.shape == (1, H, W, 2)


def test_interpolator_multiscale_shapes(interp_setup):
    model, variables = interp_setup
    x = jnp.zeros((1, H, W, 6), jnp.float32)
    outs = model.apply(variables, x, train=True,
                       mutable=["batch_stats"])[0]
    # img_0..img_5 (pwcnet.py:101-126): coarsest head + 4 refinement
    # heads + final upsample == 6 outputs, matching the reference's
    # README per-scale losses img_0_loss..img_5_loss (README.md:70).
    assert len(outs) == 6
    for i, o in enumerate(outs):
        s = 32 // (2 ** i) if i < 5 else 1
        assert o.shape == (1, H // s, W // s, 3), (i, o.shape)


def test_flow_net_param_count(flow_setup):
    _, variables = flow_setup
    assert _n_params(variables["params"]) == _expected_flow_net_params()


def test_interpolator_param_count(interp_setup):
    """The interpolator adds ONLY the FrameInterpolate heads on top of the
    flow net's encoder/decoder/flower — the Flower block is shared across
    both directions (pwcnet.py:270-280)."""
    _, variables = interp_setup
    assert _n_params(variables["params"]) == _expected_interp_params()


def test_transfer_subtrees_match(flow_setup, interp_setup):
    """Weight transfer between models = copying the encoder/decoder/flower
    param subtrees; their structures must be identical (the reference
    relied on fragile build-order name matching, pwcnet.py:276-279)."""
    _, v_flow = flow_setup
    _, v_interp = interp_setup
    for sub in ("encoder", "decoder", "flower"):
        a = jax.tree_util.tree_structure(v_flow["params"][sub])
        b = jax.tree_util.tree_structure(v_interp["params"][sub])
        assert a == b, sub
        shapes_a = jax.tree_util.tree_map(
            lambda x: x.shape, v_flow["params"][sub])
        shapes_b = jax.tree_util.tree_map(
            lambda x: x.shape, v_interp["params"][sub])
        assert shapes_a == shapes_b, sub


def test_trainable_head_modes_param_compatible(flow_setup):
    """head_scale='unit' / residual=True (the trainable-from-scratch
    parameterization, blocks.OptFlow/UpFlowBlock) must keep param
    shapes IDENTICAL to reference parity so checkpoints transfer
    between modes."""
    from qpwcnet_tpu.models import build_flow_net

    _, v_ref = flow_setup
    _, v_unit = build_flow_net(jax.random.key(0), (64, 128),
                               head_scale="unit", residual=True)
    sa = jax.tree_util.tree_map(lambda x: x.shape, v_ref["params"])
    sb = jax.tree_util.tree_map(lambda x: x.shape, v_unit["params"])
    assert sa == sb


def test_residual_mode_chains_upsampled_flow():
    """residual=True: each UpFlow output = upsampled coarse flow + head
    correction. At init the heads carry the symmetry-breaking SMALL
    init (stddev 1e-2), so each level must be CLOSE to the 2x-upsample
    of the previous (correction << 1 px) but not necessarily equal —
    a direct check that the residual add is wired per level."""
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.ops.resize import upsample2x_bilinear

    model, variables = build_flow_net(jax.random.key(0), (64, 128),
                                      head_scale="unit", residual=True)
    x = jnp.asarray(
        np.random.RandomState(0).uniform(-0.5, 0.5, (1, 64, 128, 6)),
        jnp.float32)
    outs, _ = model.apply(variables, x, train=True,
                          mutable=["batch_stats"])
    for i in range(len(outs) - 2):
        up = upsample2x_bilinear(outs[i], scale=2.0)
        d = float(jnp.max(jnp.abs(outs[i + 1] - up)))
        assert d < 1.0, (i, d)
    # the final output is bilinear-only: exactly the upsample
    up = upsample2x_bilinear(outs[-2], scale=2.0)
    assert float(jnp.max(jnp.abs(outs[-1] - up))) == 0.0


def test_fuse_batch_flow_net_exact(flow_setup):
    """fuse_batch=True (2B siamese encoder/decoder) is numerically
    EXACT vs the unfused twin pass in BOTH modes — the pyramid stages
    carry no normalizer, so batch stacking cannot couple the halves."""
    model, variables = flow_setup  # fixture builds fuse_batch=True
    from qpwcnet_tpu.models.pwcnet import PWCFlowNet

    unfused = PWCFlowNet(cv_impl="xla", fuse_batch=False)
    x = jnp.asarray(
        np.random.RandomState(3).uniform(-0.5, 0.5, (2, H, W, 6)),
        jnp.float32)
    for train in (False, True):
        kw = dict(train=train, mutable=["batch_stats"] if train else False)
        a = model.apply(variables, x, **kw)
        b = unfused.apply(variables, x, **kw)
        if train:
            (a, _), (b, _) = a, b
            a, b = a[-1], b[-1]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_fuse_batch_interp_eval_exact(interp_setup):
    """Interpolator direction fusion: one 2B Flower pass == two B
    passes in eval mode (BatchNorm running stats; train-mode batch
    statistics legitimately differ — documented in PWCInterpolator)."""
    model, variables = interp_setup
    from qpwcnet_tpu.models.pwcnet import PWCInterpolator

    unfused = PWCInterpolator(cv_impl="xla", fuse_batch=False)
    x = jnp.asarray(
        np.random.RandomState(4).uniform(-0.5, 0.5, (2, H, W, 6)),
        jnp.float32)
    a, (a01, a10) = model.apply(variables, x, train=False,
                                return_flows=True)
    b, (b01, b10) = unfused.apply(variables, x, train=False,
                                  return_flows=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-5)
    for fa, fb in zip(a01 + a10, b01 + b10):
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb),
                                   rtol=0, atol=1e-4)


@pytest.mark.slow
def test_cv_impl_fused_inference_matches_xla(flow_setup):
    """cv_impl='fused' (the fused warp+correlate inference fast path,
    models/blocks.py:UpFlowBlock) == cv_impl='xla' on a fresh init: the
    zero-init flow heads emit exactly-zero flows, so the window clamp is
    inert and the fused kernel must reproduce the unfused pair. Runs the
    Pallas kernel in interpret mode on CPU (slow)."""
    model, variables = flow_setup
    fused = model.clone(cv_impl="fused")
    x = jnp.asarray(
        np.random.RandomState(11).uniform(-0.5, 0.5, (1, H, W, 6)),
        jnp.float32)
    a = model.apply(variables, x, train=False)
    b = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=0, atol=1e-4)


def test_cv_impl_fast_preset_resolution():
    """cv_impl='fast' resolves to the measured-optimal per-level
    dispatch (artifacts/ab_cv_dispatch.py round 5): fused ONLY at the
    finest UpFlow level, 'auto' (pallas-on-TPU) everywhere else."""
    from qpwcnet_tpu.models.pwcnet import Flower

    fl = Flower(cv_impl="fast")
    assert fl._impl_at(0) == "auto"          # coarsest FlowBlock
    assert all(fl._impl_at(i) == "auto" for i in range(1, fl.num_levels))
    assert fl._impl_at(fl.num_levels) == "fused"
