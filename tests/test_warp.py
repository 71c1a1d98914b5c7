"""Port of the reference warp tests: test/test_warp.py (Warp == WarpV2) and
app/optical_flow/test_warp.py (the single-pixel flow-convention probe).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from qpwcnet_tpu.ops.warp import backward_warp, backward_warp_manual


def test_convention_probe_single_pixel():
    """A bright pixel at (i=1, j=2) in nxt with flow (u=+1, v=0) at every
    output pixel must appear at (i=1, j=1) after warping: out[i,j] =
    nxt[i + v, j + u]."""
    nxt = np.zeros((1, 3, 4, 1), np.float32)
    nxt[0, 1, 2, 0] = 1.0
    flow = np.zeros((1, 3, 4, 2), np.float32)
    flow[..., 0] = 1.0  # u = +1 (x / width axis)
    out = np.asarray(backward_warp(jnp.asarray(nxt), jnp.asarray(flow)))
    assert out[0, 1, 1, 0] == pytest.approx(1.0)
    assert out[0, 1, 2, 0] == pytest.approx(0.0)


def test_convention_probe_vertical():
    nxt = np.zeros((1, 4, 3, 1), np.float32)
    nxt[0, 2, 1, 0] = 1.0
    flow = np.zeros((1, 4, 3, 2), np.float32)
    flow[..., 1] = 1.0  # v = +1 (y / height axis)
    out = np.asarray(backward_warp(jnp.asarray(nxt), jnp.asarray(flow)))
    assert out[0, 1, 1, 0] == pytest.approx(1.0)


def test_subpixel_bilinear():
    """Half-pixel shift blends two neighbors equally."""
    img = np.zeros((1, 1, 4, 1), np.float32)
    img[0, 0, 1, 0] = 1.0
    flow = np.zeros((1, 1, 4, 2), np.float32)
    flow[..., 0] = 0.5
    out = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, 0, :, 0], [0.5, 0.5, 0.0, 0.0],
                               atol=1e-6)


def test_manual_vs_production_interior():
    """Reference test/test_warp.py gate: both warps agree away from the
    border (border behavior intentionally differs, see ops/warp.py)."""
    rng = np.random.RandomState(0)
    img = rng.uniform(size=(2, 32, 48, 3)).astype(np.float32)
    flow = rng.uniform(-3.0, 3.0, size=(2, 32, 48, 2)).astype(np.float32)
    a = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    m = np.asarray(backward_warp_manual(jnp.asarray(img), jnp.asarray(flow)))
    # interior: 4px margin > max displacement
    np.testing.assert_allclose(
        a[:, 4:-4, 4:-4], m[:, 4:-4, 4:-4], atol=1e-5
    )


def test_zero_flow_is_identity():
    rng = np.random.RandomState(1)
    img = rng.uniform(size=(1, 16, 16, 4)).astype(np.float32)
    flow = np.zeros((1, 16, 16, 2), np.float32)
    out = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_border_clamp():
    """Flow pointing far outside the image samples the border pixel."""
    img = np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1)
    flow = np.zeros((1, 1, 8, 2), np.float32)
    flow[..., 0] = 100.0
    out = np.asarray(backward_warp(jnp.asarray(img), jnp.asarray(flow)))
    np.testing.assert_allclose(out[0, 0, :, 0], 7.0, atol=1e-6)


def test_warp_gather_formulations_equal():
    """'taa4' (four take_along_axis corner gathers over flattened HW)
    must equal 'gather2x2' (one lax.gather of 2x2xC corner slices)
    bit-for-bit in f32 — same corners, same lerp order — including the
    gradient (the custom scatter-add VJP is shared). The formulations
    differ only in gather layout (ops/warp.py:_WARP_GATHER)."""
    import jax

    from qpwcnet_tpu.ops import warp as warp_mod

    rng = np.random.RandomState(3)
    img = jnp.asarray(rng.randn(2, 9, 13, 5).astype(np.float32))
    flow = jnp.asarray((rng.randn(2, 9, 13, 2) * 3).astype(np.float32))

    def run():
        f = jax.jit(lambda i, fl: backward_warp(i, fl))
        out = f(img, flow)
        g = jax.grad(lambda i, fl: float(0) + jnp.sum(
            jnp.sin(backward_warp(i, fl))), (0, 1))(img, flow)
        return np.asarray(out), np.asarray(g[0]), np.asarray(g[1])

    warp_mod.set_warp_gather("gather2x2")
    o_ref, gi_ref, gf_ref = run()
    try:
        warp_mod.set_warp_gather("taa4")
        o, gi, gf = run()
    finally:
        warp_mod.set_warp_gather("gather2x2")
    # Not bit-exact: two differently-formulated jitted XLA programs may
    # fuse/reassociate differently across backends; a tiny atol is the
    # portable claim (ADVICE r4).
    np.testing.assert_allclose(o, o_ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gi, gi_ref, rtol=0, atol=1e-6)
    np.testing.assert_allclose(gf, gf_ref, rtol=1e-6, atol=1e-5)
