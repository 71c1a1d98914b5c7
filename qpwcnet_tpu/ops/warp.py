"""Backward bilinear warping — THE flow-convention module.

The reference codebase suffered recurring (x,y)-vs-(y,x) confusion
(qpwcnet/app/optical_flow/test_warp.py:11-24 documents 8 candidate
conventions; qpwcnet/core/layers.py:474-477 settles it). This module is the
single place in qpwcnet_tpu where the convention is defined; everything else
imports from here.

CONVENTION (identical to the reference / MPI-Sintel):
  * Flow tensors are NHWC with 2 channels in ``(u, v) == (x, y)`` order:
    channel 0 is horizontal displacement (width axis), channel 1 vertical
    (height axis).
  * ``backward_warp(img, flow)[b, i, j] == img[b, i + v[b,i,j], j + u[b,i,j]]``
    sampled bilinearly. Equivalently: if ``flow`` is the forward flow from
    frame *prv* to frame *nxt* (``prv[p] == nxt[p + flow[p]]``), then
    ``backward_warp(nxt, flow) ≈ prv``.
  * Out-of-bounds samples clamp to the border (edge padding).

Two implementations are provided:
  * :func:`backward_warp` — the production op. Matches the semantics of the
    reference's ``WarpV2`` (tfa.image.dense_image_warp with flow negated and
    reversed, qpwcnet/core/layers.py:177-186): query points have their floor
    clamped to ``[0, size-2]`` and interpolation weights clipped to
    ``[0, 1]``.
  * :func:`backward_warp_manual` — a port of the reference's hand-rolled
    ``tf_warp`` (qpwcnet/core/warp.py:63-153) which truncates (not floors)
    coordinates and does NOT clip the interpolation weights, so it
    extrapolates at the border. Kept for the `test_warp` parity gate
    (reference test/test_warp.py compares Warp vs WarpV2); interior pixels
    agree between both implementations.

TPU note: the production gather fetches the whole 2x2xC bilinear corner
block with ONE ``lax.gather`` (slice_sizes=(1,2,2,C), the 'gather2x2'
formulation below); the corner origin is clipped so the slice is in-bounds
by construction. The alternative 'taa4' formulation (four flattened-HW
``take_along_axis`` gathers, one per corner) measured SLOWER in-model —
see the negative-result note at ``_WARP_GATHER``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _grid(h: int, w: int, dtype=jnp.float32):
    """Return (gy, gx) pixel-center coordinate grids of shape (h, w)."""
    gy = jax.lax.broadcasted_iota(dtype, (h, w), 0)
    gx = jax.lax.broadcasted_iota(dtype, (h, w), 1)
    return gy, gx


def _gather_hw(img_flat: jax.Array, lin_idx: jax.Array) -> jax.Array:
    """Gather pixels by flattened-HW linear index.

    img_flat: (B, H*W, C); lin_idx: (B, H*W) int32 -> (B, H*W, C)
    """
    return jnp.take_along_axis(img_flat, lin_idx[..., None], axis=1)


def _warp_coords(flow, h: int, w: int, hp: int, wp: int,
                 y_offset: int = 0):
    """Shared coordinate math: clipped corner origin + interpolation
    weights (tfa.image.interpolate_bilinear semantics: floor clamped to
    [0, size-2], alphas clipped to [0, 1] => border-clamped sampling).

    y_offset shifts the query rows: output row y samples source row
    ``y + y_offset + flow_y`` (the spatial-sharding window warp, where
    the source carries halo rows above the output rows)."""
    gy, gx = _grid(h, w)
    qx = gx[None] + flow[..., 0]
    qy = gy[None] + flow[..., 1] + float(y_offset)
    x0 = jnp.clip(jnp.floor(qx), 0.0, wp - 2.0)
    y0 = jnp.clip(jnp.floor(qy), 0.0, hp - 2.0)
    ax = jnp.clip(qx - x0, 0.0, 1.0)
    ay = jnp.clip(qy - y0, 0.0, 1.0)
    return x0, y0, ax, ay


# Gather formulation used by _warp_impl. 'gather2x2': ONE lax.gather of
# (1,2,2,C) corner slices. 'taa4': four take_along_axis corner gathers
# over flattened HW — each emits (B,HW,C) in the C-minor layout the
# lerp and downstream convs already use, avoiding the (B,HW,2,2,C)
# relayout copies XLA inserts after the slice gather (measured 235 MB
# of pure copy at the finest headline level, artifacts/hlo_bytes.py).
#
# MEASURED (round 4, in-model 448x1024 b8 bf16 headline,
# artifacts/ab_warp_inmodel2.py): taa4 LOSES — 98.1 ms vs 68.7 ms for
# gather2x2. Four single-corner gathers issue 4x the gather descriptors
# and defeat XLA's fusion of the 2x2 corner block into one kernel; the
# relayout copies they avoid are cheaper than the extra gather passes.
# gather2x2 stays the default; taa4 is kept as the documented negative
# result (value/grad equality: tests/test_warp.py).
_WARP_GATHER = "gather2x2"


def set_warp_gather(kind: str) -> None:
    """Select the warp gather formulation ('gather2x2' | 'taa4').

    Module-level because the warp is called from inside nn.Modules whose
    signatures shouldn't carry backend tuning knobs. Affects tracing:
    call before jit, or re-jit after switching."""
    global _WARP_GATHER
    assert kind in ("gather2x2", "taa4"), kind
    _WARP_GATHER = kind


def _warp_impl(img: jax.Array, flow: jax.Array,
               y_offset: int = 0) -> jax.Array:
    b, hi, wi, c = img.shape
    _, h, w, _ = flow.shape  # output spatial dims follow the flow
    flow = flow.astype(jnp.float32)

    # degenerate 1-pixel dims: edge-pad the operand so the 2x2 slice
    # fits; border-clamped sampling is unchanged.
    if hi < 2 or wi < 2:
        img = jnp.pad(
            img,
            ((0, 0), (0, max(0, 2 - hi)), (0, max(0, 2 - wi)), (0, 0)),
            mode="edge",
        )
    hp, wp = max(hi, 2), max(wi, 2)

    x0, y0, ax, ay = _warp_coords(flow, h, w, hp, wp, y_offset)
    ax = ax[..., None].astype(img.dtype)
    ay = ay[..., None].astype(img.dtype)

    if _WARP_GATHER == "taa4":
        flat = img.reshape(b, hp * wp, c)
        lin = (y0.astype(jnp.int32) * wp
               + x0.astype(jnp.int32)).reshape(b, h * w)

        def gat(off):
            return jnp.take_along_axis(
                flat, (lin + off)[..., None], axis=1).reshape(b, h, w, c)

        g00, g01 = gat(0), gat(1)
        g10, g11 = gat(wp), gat(wp + 1)
        top = g00 + (g01 - g00) * ax
        bot = g10 + (g11 - g10) * ax
        return top + (bot - top) * ay

    idx = jnp.stack(
        [y0.astype(jnp.int32), x0.astype(jnp.int32)], axis=-1
    ).reshape(b, h * w, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    g = jax.lax.gather(
        img, idx, dn, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    ).reshape(b, h, w, 2, 2, c)

    top = g[..., 0, 0, :] + (g[..., 0, 1, :] - g[..., 0, 0, :]) * ax
    bot = g[..., 1, 0, :] + (g[..., 1, 1, :] - g[..., 1, 0, :]) * ax
    return top + (bot - top) * ay


@jax.custom_vjp
def backward_warp(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Backward bilinear warp (production op; WarpV2 semantics).

    Args:
      img: (B, H, W, C) source image/features.
      flow: (B, H, W, 2) flow in (x, y) channel order.

    Returns:
      (B, H, W, C): ``out[b,i,j] = img[b, i + flow_y, j + flow_x]`` with
      border clamping, bilinearly interpolated. Matches
      ``tfa.image.dense_image_warp(img, -flow[..., ::-1])``.

    Implementation: ONE ``lax.gather`` fetching the whole 2x2x C corner
    neighborhood per output pixel (slice_sizes=(1,2,2,C), CLIP mode).
    TPU gather cost is dominated by index count — a single 4-corner
    gather measured 1.6x faster than four per-corner gathers at the
    finest pyramid level. Interpolation runs in the input dtype (bf16
    stays bf16); coordinate math is f32.

    Gradients use a custom VJP (:func:`_warp_bwd`): XLA's transpose of
    the 2x2-slice gather is a SEQUENTIAL while-loop scatter (one
    iteration per output pixel — measured ~3 s/step in the 256x512 bs16
    train step); the custom d_img path scatters four single-index
    full-C rows over flattened HW instead, which XLA:TPU vectorizes
    (measured 0.36 ms at (16,128,256,64)).
    """
    return _warp_impl(img, flow)


def _warp_fwd(img, flow):
    return _warp_impl(img, flow), (img, flow)


def _warp_bwd_impl(img, flow, g, y_offset: int = 0):
    b, hi, wi, c = img.shape
    _, h, w, _ = flow.shape
    flow_f = flow.astype(jnp.float32)
    hp, wp = max(hi, 2), max(wi, 2)

    # d_flow: differentiate the forward wrt flow only — this path is
    # elementwise over the gathered corners (no scatter; the gather's
    # integer index path carries no gradient).
    _, flow_vjp = jax.vjp(lambda f: _warp_impl(img, f, y_offset), flow)
    d_flow = flow_vjp(g)[0]

    # d_img: four single-index scatter-adds over flattened HW.
    x0, y0, ax, ay = _warp_coords(flow_f, h, w, hp, wp, y_offset)
    lin = (y0 * wp + x0).astype(jnp.int32).reshape(b, h * w)
    gf = g.reshape(b, h * w, c)
    ax = ax.reshape(b, h * w, 1).astype(g.dtype)
    ay = ay.reshape(b, h * w, 1).astype(g.dtype)
    bidx = jnp.arange(b)[:, None]
    acc = jnp.zeros((b, hp * wp, c), g.dtype)
    for dy in (0, 1):
        wy = ay if dy else (1.0 - ay)
        for dx in (0, 1):
            wgt = wy * (ax if dx else (1.0 - ax))
            acc = acc.at[bidx, lin + dy * wp + dx, :].add(wgt * gf)
    d_img = acc.reshape(b, hp, wp, c)
    # fold gradients of the degenerate-dim edge padding back onto the
    # edge pixels (pad mode="edge" in _warp_impl).
    if hp != hi:
        d_img = d_img[:, :hi].at[:, hi - 1].add(d_img[:, hi:].sum(1))
    if wp != wi:
        d_img = d_img[:, :, :wi].at[:, :, wi - 1].add(
            d_img[:, :, wi:].sum(2))
    return d_img.astype(img.dtype), d_flow.astype(flow.dtype)


def _warp_bwd(res, g):
    img, flow = res
    return _warp_bwd_impl(img, flow, g)


backward_warp.defvjp(_warp_fwd, _warp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def backward_warp_window(img: jax.Array, flow: jax.Array,
                         y_offset: int) -> jax.Array:
    """:func:`backward_warp` sampling from a TALLER source window.

    img: (B, H_out + extra, W, C) — typically the local H shard plus
    halo rows exchanged from mesh neighbors (spatial sharding,
    qpwcnet_tpu.parallel.spatial_ops); flow: (B, H_out, W, 2).

    out[b, y, x] = img[b, y + y_offset + flow_y, x + flow_x], bilinear,
    clamped to the WINDOW bounds — with y_offset = halo this equals the
    global backward_warp wherever |flow_y| <= halo and the halo rows
    replicate the global border where the window crosses it.
    """
    return _warp_impl(img, flow, y_offset)


def _warp_window_fwd(img, flow, y_offset):
    return _warp_impl(img, flow, y_offset), (img, flow)


def _warp_window_bwd(y_offset, res, g):
    img, flow = res
    return _warp_bwd_impl(img, flow, g, y_offset)


backward_warp_window.defvjp(_warp_window_fwd, _warp_window_bwd)


def backward_warp_manual(img: jax.Array, flow: jax.Array) -> jax.Array:
    """Port of the reference's hand-rolled ``tf_warp``
    (qpwcnet/core/warp.py:63-153).

    Differences from :func:`backward_warp` (border pixels only):
    coordinates are truncated toward zero (tf.cast semantics), corner
    indices clamped to [0, size-1] independently, and interpolation weights
    are computed from the *unclamped* query point, so the result
    extrapolates at borders. Interior pixels agree with
    :func:`backward_warp` — this is the `test_warp` equality anchor.
    """
    b, h, w, c = img.shape
    flow = flow.astype(jnp.float32)

    gy, gx = _grid(h, w)
    qx = gx[None] + flow[..., 0]
    qy = gy[None] + flow[..., 1]

    # tf.cast(x, int32) truncates toward zero.
    x0i = qx.astype(jnp.int32)
    y0i = qy.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    x0i = jnp.clip(x0i, 0, w - 1)
    x1i = jnp.clip(x1i, 0, w - 1)
    y0i = jnp.clip(y0i, 0, h - 1)
    y1i = jnp.clip(y1i, 0, h - 1)

    img_flat = img.astype(jnp.float32).reshape(b, h * w, c)

    def gat(yi, xi):
        return _gather_hw(img_flat, (yi * w + xi).reshape(b, h * w))

    ia = gat(y0i, x0i)
    ib = gat(y1i, x0i)
    ic = gat(y0i, x1i)
    id_ = gat(y1i, x1i)

    x0f = x0i.astype(jnp.float32)
    x1f = x1i.astype(jnp.float32)
    y0f = y0i.astype(jnp.float32)
    y1f = y1i.astype(jnp.float32)

    wa = ((x1f - qx) * (y1f - qy)).reshape(b, h * w, 1)
    wb = ((x1f - qx) * (qy - y0f)).reshape(b, h * w, 1)
    wc = ((qx - x0f) * (y1f - qy)).reshape(b, h * w, 1)
    wd = ((qx - x0f) * (qy - y0f)).reshape(b, h * w, 1)

    out = wa * ia + wb * ib + wc * ic + wd * id_
    return out.reshape(b, h, w, c).astype(img.dtype)
