"""Port of the reference cost-volume gates: test/test_cost_volume.py and
app/test/test_cvol_equal.py (composed-op == fused kernel), plus semantics
anchors (channel ordering, zero-pad behavior, self-correlation argmax).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qpwcnet_tpu.ops.cost_volume import cost_volume_xla
from qpwcnet_tpu.ops.pallas.cost_volume_kernel import cost_volume_pallas
from qpwcnet_tpu.ops.flow_vis import cost_volume_to_flow


def _ref_numpy_cost_volume(prv, nxt, r=4):
    """Independent numpy oracle of the reference semantics
    (qpwcnet/core/layers.py:72-100)."""
    b, h, w, c = prv.shape
    d = 2 * r + 1
    pad = np.zeros((b, h + 2 * r, w + 2 * r, c), prv.dtype)
    pad[:, r:r + h, r:r + w] = nxt
    out = np.zeros((b, h, w, d * d), np.float32)
    for i0 in range(d):
        for j0 in range(d):
            roi = pad[:, i0:i0 + h, j0:j0 + w]
            out[..., i0 * d + j0] = (prv * roi).mean(axis=-1)
    return np.where(out > 0, out, 0.1 * out)


def test_xla_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    prv = rng.standard_normal((2, 12, 20, 8)).astype(np.float32)
    nxt = rng.standard_normal((2, 12, 20, 8)).astype(np.float32)
    got = np.asarray(cost_volume_xla(jnp.asarray(prv), jnp.asarray(nxt)))
    want = _ref_numpy_cost_volume(prv, nxt)
    np.testing.assert_allclose(got, want, atol=1e-5)


def _pallas_interpret(prv, nxt, **kw):
    """Run the fused kernel in interpreter mode (CPU test platform).

    On real TPU hardware the compiled kernel is equality-checked
    against cost_volume_xla by bench.py (--check, run by the driver).
    """
    return np.asarray(
        cost_volume_pallas(
            jnp.asarray(prv), jnp.asarray(nxt), interpret=True, **kw
        )
    )


@pytest.mark.slow
def test_pallas_matches_xla():
    """The reference gate (CostVolume == CostVolumeV2) — here the XLA
    formulation vs the fused Pallas kernel (interpreted on CPU).
    Tiny shapes: interpret mode is slow."""
    rng = np.random.RandomState(1)
    prv = rng.standard_normal((1, 8, 16, 4)).astype(np.float32)
    nxt = rng.standard_normal((1, 8, 16, 4)).astype(np.float32)
    a = np.asarray(cost_volume_xla(jnp.asarray(prv), jnp.asarray(nxt)))
    b = _pallas_interpret(prv, nxt, search_range=4, tile_h=8)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pallas_non_divisible_height():
    rng = np.random.RandomState(2)
    prv = rng.standard_normal((1, 6, 16, 4)).astype(np.float32)
    nxt = rng.standard_normal((1, 6, 16, 4)).astype(np.float32)
    a = np.asarray(cost_volume_xla(jnp.asarray(prv), jnp.asarray(nxt)))
    b = _pallas_interpret(prv, nxt, search_range=4, tile_h=8)
    np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)


def test_center_channel_is_self_correlation():
    """Channel k=40 (di=dj=0) must equal leaky_relu(mean_c(prv*nxt))."""
    rng = np.random.RandomState(3)
    prv = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    out = np.asarray(cost_volume_xla(jnp.asarray(prv), jnp.asarray(prv)))
    want = (prv * prv).mean(axis=-1)
    want = np.where(want > 0, want, 0.1 * want)
    np.testing.assert_allclose(out[..., 40], want, atol=1e-5)


def test_argmax_decodes_known_shift():
    """Construct a frame pair with known uniform flow (u, v); the
    cost-volume correlation argmax must decode it.

    Flow convention (ops/warp.py): prv[i, j] == nxt[i + v, j + u], so
    nxt[i, j] == prv[i - v, j - u] == np.roll(prv, (v, u)). Zero-mean
    features make self-correlation the unambiguous argmax.
    cost_volume_to_flow stacks (di, dj) == (y, x) deltas (vis.py:9-34).
    """
    rng = np.random.RandomState(4)
    prv = rng.standard_normal((1, 16, 16, 64)).astype(np.float32)
    u, v = -3, 2
    nxt = np.roll(prv, shift=(v, u), axis=(1, 2))
    cv = np.asarray(cost_volume_xla(jnp.asarray(prv), jnp.asarray(nxt)))
    flo = np.asarray(cost_volume_to_flow(jnp.asarray(cv)))
    # interior, away from roll wraparound
    inner = flo[0, 5:-5, 5:-5]
    assert inner[..., 0] == pytest.approx(v)  # di == flow y
    assert inner[..., 1] == pytest.approx(u)  # dj == flow x


@pytest.mark.slow
def test_fused_warp_cv_matches_unfused_pair():
    """Fused warp+correlate kernel (ops/pallas/warp_cv_kernel.py) ==
    cost_volume_xla(prv, backward_warp(nxt, flow)) wherever
    |flow| <= warp_window (the documented window-clamp approximation).
    Interpret mode, tiny shapes (slow on CPU). The compiled-kernel A/B
    measurement lives in DESIGN.md (VERDICT r3 task 3)."""
    from qpwcnet_tpu.ops.pallas.warp_cv_kernel import warp_cost_volume_pallas
    from qpwcnet_tpu.ops.warp import backward_warp

    rng = np.random.RandomState(7)
    ww = 2
    prv = rng.standard_normal((1, 16, 24, 4)).astype(np.float32)
    nxt = rng.standard_normal((1, 16, 24, 4)).astype(np.float32)
    # smooth in-window flow incl. exact-boundary values at the clamp
    flow = (rng.rand(1, 16, 24, 2).astype(np.float32) * 2 - 1) * ww
    want = np.asarray(
        cost_volume_xla(
            jnp.asarray(prv),
            backward_warp(jnp.asarray(nxt), jnp.asarray(flow)),
        )
    )
    got = np.asarray(
        warp_cost_volume_pallas(
            jnp.asarray(prv), jnp.asarray(nxt), jnp.asarray(flow),
            search_range=4, warp_window=ww, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_fused_warp_cv_clamps_flow_to_window():
    """Out-of-window displacements are clamped (window-warp semantics,
    ops/warp.py:backward_warp_window): a uniform flow of +5 rows with
    warp_window=2 must equal the unfused pair under flow clamped to
    +2."""
    from qpwcnet_tpu.ops.pallas.warp_cv_kernel import warp_cost_volume_pallas
    from qpwcnet_tpu.ops.warp import backward_warp

    rng = np.random.RandomState(8)
    prv = rng.standard_normal((1, 16, 24, 4)).astype(np.float32)
    nxt = rng.standard_normal((1, 16, 24, 4)).astype(np.float32)
    flow = np.zeros((1, 16, 24, 2), np.float32)
    flow[..., 1] = 5.0
    clamped = np.clip(flow, -2, 2)
    want = np.asarray(
        cost_volume_xla(
            jnp.asarray(prv),
            backward_warp(jnp.asarray(nxt), jnp.asarray(clamped)),
        )
    )
    got = np.asarray(
        warp_cost_volume_pallas(
            jnp.asarray(prv), jnp.asarray(nxt), jnp.asarray(flow),
            search_range=4, warp_window=2, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_fused_warp_cv_multitile_unaligned_h():
    """Multi-row-tile grid with h not a tile multiple (hp padding) and a
    DMA row extent that needs sublane-rounding (tile_h=8, ww=2 =>
    rows_s 24->24... the 8-alignment path is exercised for every tile):
    the tile seams and padded rows must not leak into the output."""
    from qpwcnet_tpu.ops.pallas.warp_cv_kernel import warp_cost_volume_pallas
    from qpwcnet_tpu.ops.warp import backward_warp

    rng = np.random.RandomState(9)
    ww = 2
    prv = rng.standard_normal((2, 20, 24, 4)).astype(np.float32)
    nxt = rng.standard_normal((2, 20, 24, 4)).astype(np.float32)
    flow = (rng.rand(2, 20, 24, 2).astype(np.float32) * 2 - 1) * ww
    want = np.asarray(
        cost_volume_xla(
            jnp.asarray(prv),
            backward_warp(jnp.asarray(nxt), jnp.asarray(flow)),
        )
    )
    got = np.asarray(
        warp_cost_volume_pallas(
            jnp.asarray(prv), jnp.asarray(nxt), jnp.asarray(flow),
            search_range=4, warp_window=ww, tile_h=8, interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_trainable_fused_value_and_grad():
    """warp_cost_volume_trainable: forward == the fused kernel; gradient
    == the gradient of the EXACT composition it computes,
    cost_volume(prv, backward_warp(nxt, clip(flow, ±ww))) — including at
    clamped pixels (flow grad 0 there). Interpret mode, tiny shapes."""
    from qpwcnet_tpu.ops.pallas.warp_cv_kernel import (
        warp_cost_volume_pallas,
        warp_cost_volume_trainable,
    )
    from qpwcnet_tpu.ops.warp import backward_warp

    rng = np.random.RandomState(3)
    ww = 2
    prv = jnp.asarray(rng.standard_normal((1, 16, 24, 4)).astype(np.float32))
    nxt = jnp.asarray(rng.standard_normal((1, 16, 24, 4)).astype(np.float32))
    # mix of in-window and clamped displacements
    flow = jnp.asarray(
        (rng.rand(1, 16, 24, 2).astype(np.float32) * 2 - 1) * (2 * ww))

    got = warp_cost_volume_trainable(
        prv, nxt, flow, search_range=4, warp_window=ww, interpret=True)
    want = warp_cost_volume_pallas(
        prv, nxt, flow, search_range=4, warp_window=ww, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    def loss_fused(p, n, f):
        return jnp.sum(jnp.sin(warp_cost_volume_trainable(
            p, n, f, search_range=4, warp_window=ww, interpret=True)))

    def loss_ref(p, n, f):
        nw = backward_warp(n, jnp.clip(f, -float(ww), float(ww)))
        return jnp.sum(jnp.sin(cost_volume_xla(p, nw)))

    g_fused = jax.grad(loss_fused, (0, 1, 2))(prv, nxt, flow)
    g_ref = jax.grad(loss_ref, (0, 1, 2))(prv, nxt, flow)
    for gf, gr, name in zip(g_fused, g_ref, ("prv", "nxt", "flow")):
        np.testing.assert_allclose(
            np.asarray(gf), np.asarray(gr), atol=5e-4,
            err_msg=f"grad mismatch for {name}")
