"""Fused Pallas TPU kernel for the 81-offset cost-volume correlation.

Replaces the reference's tfa.layers.optical_flow.CorrelationCost CUDA op
(qpwcnet/core/layers.py:124-125) with a VMEM-resident displacement search.

Why a kernel: the XLA shift-and-multiply formulation re-reads the prv and
padded-nxt feature maps from HBM for each of the 81 displacements. This
kernel keeps one prv row-tile and one haloed nxt row-tile in VMEM and
computes all 81 output channels from them, so HBM traffic drops to
~(2C + d²) f32 per pixel instead of ~(2C·d²).

Layout: the kernel operates in (C, H, W) per-image layout so the (H, W)
plane maps onto (sublane, lane) tiles with full lane utilization even when
C is small (C=16 at the finest pyramid level). The NHWC<->NCHW transposes
happen outside and fuse into neighboring XLA ops.

Halo handling: `nxt` is zero-padded by r in H and W by the caller; the
kernel DMAs the (C, TH+2r, W+2r) haloed tile from HBM into VMEM scratch
itself (overlapping-block index maps are not expressible with standard
BlockSpecs).

Numerics match qpwcnet_tpu.ops.cost_volume.cost_volume_xla exactly
(tested in tests/test_cost_volume.py): mean over channels of prv*shifted
nxt, then leaky_relu(0.1); output channel k = (di+r)*(2r+1) + (dj+r).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# NHWC<->NCHW relayout strategy around the kernels: 'transpose' uses
# jnp.transpose; 'conv' routes the relayout through an identity-kernel
# convolution so the MXU performs it (bit-exact: multiplying by an
# exact 0/1 kernel is lossless in every dtype; f32 uses HIGHEST
# precision so operands are not truncated to bf16). A/B-measured on the
# 448x1024 b8 headline with host-readout sync: the two are EQUAL within
# noise (105.0 vs 105.0 ms best-of-6) — XLA already overlaps these
# transposes well — so the simpler 'transpose' is the default and
# 'conv' stays available for layout experiments (DESIGN.md open
# item 6).
_RELAYOUT = os.environ.get("QPWCNET_CV_RELAYOUT", "transpose")


def _relayout_precision(dtype):
    return (jax.lax.Precision.HIGHEST
            if dtype == jnp.float32 else jax.lax.Precision.DEFAULT)


def _to_chw(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, C, H, W)."""
    if _RELAYOUT != "conv":
        return x.transpose(0, 3, 1, 2)
    c = x.shape[-1]
    eye = jnp.eye(c, dtype=x.dtype).reshape(1, 1, c, c)
    return jax.lax.conv_general_dilated(
        x, eye, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NCHW"),
        precision=_relayout_precision(x.dtype))


def _to_hwc(x: jax.Array) -> jax.Array:
    """(B, C, H, W) -> (B, H, W, C)."""
    if _RELAYOUT != "conv":
        return x.transpose(0, 2, 3, 1)
    c = x.shape[1]
    eye = jnp.eye(c, dtype=x.dtype).reshape(1, 1, c, c)
    return jax.lax.conv_general_dilated(
        x, eye, (1, 1), "VALID",
        dimension_numbers=("NCHW", "HWIO", "NHWC"),
        precision=_relayout_precision(x.dtype))


def _cv_kernel(prv_ref, nxt_hbm, out_ref, scratch, shiftb, sem, *, r: int,
               th: int, w: int, inv_c: float):
    d = 2 * r + 1
    b = pl.program_id(0)
    i = pl.program_id(1)

    # Pull the haloed nxt tile (C, TH+2r, W+2r->Wp) into VMEM.
    dma = pltpu.make_async_copy(
        nxt_hbm.at[b, :, pl.ds(i * th, th + 2 * r), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()

    prv = prv_ref[0]  # (C, TH, W), native dtype
    for dj in range(d):
        # Hoist the lane-axis (W) shift: ONE unaligned-lane relayout of
        # the haloed tile per dj instead of one per (di, dj) pair — lane
        # relayouts are the dominant kernel overhead (measured; cf.
        # DESIGN.md "81 per-displacement relayout copies"). The di slice
        # below is a sublane-axis slice of the scratch. The shift goes
        # through an EXPLICIT VMEM scratch buffer: a plain slice temp
        # lets Mosaic's scheduler keep all d per-dj temps live at once
        # (observed 22.5 MB scoped-vmem stack OOM); the buffer write
        # serializes the dj groups and bounds liveness to one copy.
        # (A roll-based variant was tried instead of slices, but Mosaic
        # unrolled it into a >4GB executable; static slices compile
        # compactly.)
        shiftb[:] = scratch[:, :, dj:dj + w]  # (C, TH+2r, W)
        for di in range(d):
            roi = shiftb[:, di:di + th, :]
            # f32 accumulator via the sum dtype — avoids materializing
            # full f32 copies of the tiles on the Mosaic stack.
            acc = jnp.sum(prv * roi, axis=0, dtype=jnp.float32) * inv_c
            out_ref[0, di * d + dj] = jnp.where(
                acc > 0, acc, 0.1 * acc
            ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def cost_volume_pallas(
    prv: jax.Array,
    nxt: jax.Array,
    search_range: int = 4,
    tile_h: int | None = None,
    interpret: bool = False,
    nxt_h_haloed: bool = False,
) -> jax.Array:
    """Fused cost volume. prv, nxt: (B, H, W, C) -> (B, H, W, (2r+1)²).

    Semantics identical to cost_volume_xla (zero-padded nxt, channel-mean
    correlation, leaky_relu(0.1)). Differentiable both ways in Pallas:
    the backward pass runs two dedicated VMEM-resident kernels
    (:func:`_cv_bwd_prv_kernel` / :func:`_cv_bwd_nxt_kernel`) — the XLA
    VJP of the shift-and-multiply formulation balloons to ~36 GB of HBM
    temporaries at 448x1024 b8 (DESIGN.md).

    nxt_h_haloed: the caller supplies ``nxt`` with the H halo already
    attached — shape (B, H + 2r, W, C), rows [r, H+r) aligned with prv —
    instead of relying on internal zero padding. This is the spatial
    (H-sharded) fast path: each shard halo-exchanges r rows with its
    mesh neighbors and calls the kernel locally
    (qpwcnet_tpu.parallel.spatial_ops). The VJP then returns d(nxt)
    with the same haloed shape, so halo-row gradients flow back through
    the exchange's transpose automatically.
    """
    return _cost_volume_pallas_impl(
        prv, nxt, search_range=search_range, tile_h=tile_h,
        interpret=interpret, nxt_h_haloed=nxt_h_haloed,
    )


def _cv_pallas_fwd(prv, nxt, search_range, tile_h, interpret,
                   nxt_h_haloed):
    out = _cost_volume_pallas_impl(
        prv, nxt, search_range=search_range, tile_h=tile_h,
        interpret=interpret, nxt_h_haloed=nxt_h_haloed,
    )
    # Residuals: out is kept (it is live downstream anyway) so the
    # leaky-relu mask needs no recompute: sign(out) == sign(acc).
    return out, (prv, nxt, out)


def _bwd_kernels_fit(h, w, c, d, itemsize, r) -> bool:
    """True if both backward kernels fit the scoped-VMEM budget at the
    minimum tile height. At large C with tiny spatial dims (the coarsest
    Flow level: C=256, 8x16) Mosaic's unrolled-loop temporaries exceed
    the 16 MB stack no matter the tile (observed 17.17M at th=8) — those
    levels use the XLA VJP instead, whose temporaries are tiny there."""
    budget = 10 * 1024 * 1024
    for halo in (True, False):
        cand = _pick_tile_h_bwd(h, w, c, d, itemsize, r, dacc_halo=halo,
                                budget=budget)
        if cand == 8:
            # re-evaluate the floor tile with the FULL per-branch cost
            # (including the haloed DMA scratch and shift-buffer terms).
            if _bwd_need(8, w, c, d, itemsize, r, halo) > budget:
                return False
    return True


def _cv_pallas_bwd(search_range, tile_h, interpret, nxt_h_haloed, res, g):
    prv, nxt, out = res
    b, h, w, c = prv.shape
    d = 2 * search_range + 1
    if not _bwd_kernels_fit(h, w, c, d, prv.dtype.itemsize, search_range):
        from qpwcnet_tpu.ops.cost_volume import (
            cost_volume_xla, cost_volume_xla_haloed)

        if nxt_h_haloed:
            _, vjp = jax.vjp(
                lambda p, n: cost_volume_xla_haloed(p, n, search_range),
                prv, nxt)
        else:
            _, vjp = jax.vjp(
                lambda p, n: cost_volume_xla(p, n, search_range), prv, nxt
            )
        return vjp(g)
    # d(leaky_relu)/d(acc) from the saved output sign; elementwise, XLA
    # fuses it into the producers of g.
    # NOTE: a caller-supplied tile_h is a FORWARD tuning knob; the
    # backward kernels' VMEM footprint is much larger (81-channel dacc
    # halo + extra shift/acc scratch), so they always pick their own
    # tile via _pick_tile_h_bwd rather than inheriting the override.
    dacc = (g * jnp.where(out > 0, 1.0, 0.1).astype(g.dtype))
    dprv = _cv_bwd_prv_impl(
        dacc, nxt, search_range=search_range, interpret=interpret,
        nxt_h_haloed=nxt_h_haloed,
    ).astype(prv.dtype)
    dnxt = _cv_bwd_nxt_impl(
        dacc, prv, search_range=search_range, interpret=interpret,
        h_haloed_out=nxt_h_haloed,
    ).astype(nxt.dtype)
    return dprv, dnxt


cost_volume_pallas.defvjp(_cv_pallas_fwd, _cv_pallas_bwd)


def _bwd_need(cand: int, w: int, c: int, d: int, itemsize: int, r: int,
              dacc_halo: bool) -> int:
    """Exact VMEM bytes a backward kernel needs at row-tile `cand`:
    double-buffered blocks, haloed DMA scratches, per-dj shift buffers,
    the f32 accumulator AND a worst-case allowance for the inner
    unrolled loop's product temporaries — Mosaic's scheduler can keep
    all d per-iteration temps live at once (observed 37 MB scoped-vmem
    stack OOM without this term)."""
    w_lane = ((w + 127) // 128) * 128
    wp = ((w + 2 * r + 127) // 128) * 128
    rup = lambda x: ((x + 7) // 8) * 8  # noqa: E731
    thp = rup(cand)
    hal = rup(cand + 2 * r)
    need = (
        2 * 4 * c * thp * w_lane            # f32 out block x2
        + 4 * c * thp * w_lane              # f32 accumulator
        + d * c * thp * w_lane * (itemsize + 4)  # unrolled temps
    )
    if dacc_halo:
        # dnxt kernel: haloed dacc + prv DMAs and both shift bufs.
        need += (
            itemsize * d * d * (hal * wp + hal * w_lane)
            + itemsize * c * (hal * wp + hal * w_lane)
        )
    else:
        # dprv kernel: dacc arrives as a VMEM block (x2 buffered),
        # nxt is the haloed DMA + shift buffer.
        need += (
            2 * itemsize * d * d * thp * w_lane
            + itemsize * c * (hal * wp + hal * w_lane)
        )
    return need


def _pick_tile_h_bwd(
    h: int, w: int, c: int, d: int, itemsize: int, r: int,
    dacc_halo: bool, budget: int = 10 * 1024 * 1024,
) -> int:
    """Row-tile size for the backward kernels (see :func:`_bwd_need`)."""
    for cand in range(128, 7, -8):
        if _bwd_need(cand, w, c, d, itemsize, r, dacc_halo) <= budget:
            return cand
    return 8


def _cv_bwd_prv_kernel(dacc_ref, nxt_hbm, out_ref, halo, shiftb, acc,
                       sem, *, r: int, th: int, w: int, inv_c: float):
    """dprv[c,y,x] = inv_c * sum_k dacc[k,y,x] * nxt_pad[c, y+di, x+dj].

    Same haloed-tile structure as the forward kernel with the roles of
    the 81-channel tensor and the C-channel tensor swapped. Static
    slices only (Mosaic cannot compile dynamic sublane/lane offsets);
    the per-dj lane shift goes through an explicit scratch buffer whose
    write serializes the dj groups and bounds temp liveness, and the
    81-term sum accumulates into an explicit f32 VMEM scratch.
    """
    d = 2 * r + 1
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma = pltpu.make_async_copy(
        nxt_hbm.at[b, :, pl.ds(i * th, th + 2 * r), :], halo, sem
    )
    dma.start()
    dma.wait()

    acc[:] = jnp.zeros_like(acc)
    for dj in range(d):
        shiftb[:] = halo[:, :, dj:dj + w]
        for di in range(d):
            prod = dacc_ref[0, di * d + dj][None] * shiftb[:, di:di + th, :]
            acc[:] += prod.astype(jnp.float32)
    out_ref[0] = (acc[:] * inv_c).astype(out_ref.dtype)


def _cv_bwd_nxt_kernel(dacc_hbm, prv_hbm, out_ref, dacc_s, prv_s,
                       shift_d, shift_p, acc, sem, *, r: int, th: int,
                       w: int, inv_c: float):
    """dnxt[c,u,v] = inv_c * sum_k (dacc*prv)[k,c, u+2r-di, v+2r-dj]
    over the r-zero-padded product — the correlation with displacements
    reversed (channel for shift (di,dj) is d*d-1 - (di*d+dj)). Both
    operands arrive r-padded; halo rows/cols beyond the image are zero
    so padded positions contribute nothing. Same static-slice /
    shift-buffer structure as _cv_bwd_prv_kernel.
    """
    d = 2 * r + 1
    b = pl.program_id(0)
    i = pl.program_id(1)
    dma_d = pltpu.make_async_copy(
        dacc_hbm.at[b, :, pl.ds(i * th, th + 2 * r), :], dacc_s,
        sem.at[0],
    )
    dma_p = pltpu.make_async_copy(
        prv_hbm.at[b, :, pl.ds(i * th, th + 2 * r), :], prv_s,
        sem.at[1],
    )
    dma_d.start()
    dma_p.start()
    dma_d.wait()
    dma_p.wait()

    acc[:] = jnp.zeros_like(acc)
    for dj in range(d):
        shift_d[:] = dacc_s[:, :, dj:dj + w]
        shift_p[:] = prv_s[:, :, dj:dj + w]
        for di in range(d):
            k = d * d - 1 - (di * d + dj)
            prod = (shift_d[k, di:di + th, :][None]
                    * shift_p[:, di:di + th, :])
            acc[:] += prod.astype(jnp.float32)
    out_ref[0] = (acc[:] * inv_c).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("search_range", "tile_h", "interpret",
                     "nxt_h_haloed"),
)
def _cv_bwd_prv_impl(dacc, nxt, search_range=4, tile_h=None,
                     interpret=False, nxt_h_haloed=False):
    r = search_range
    d = 2 * r + 1
    b, h, w, _ = dacc.shape
    c = nxt.shape[-1]
    th = tile_h or _pick_tile_h_bwd(
        h, w, c, d, nxt.dtype.itemsize, r, dacc_halo=False)
    th = min(th, max(8, ((h + 7) // 8) * 8))
    hp = ((h + th - 1) // th) * th
    wp = ((w + 2 * r + 127) // 128) * 128

    dacc_t = _to_chw(dacc)                        # (B, d*d, H, W)
    nxt_t = _to_chw(nxt)                          # (B, C, H(+2r), W)
    if hp != h:
        dacc_t = jnp.pad(dacc_t, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    # nxt needs rows [-r, hp + r) relative to prv/dacc rows: zero-pad,
    # or keep the caller-supplied halo rows (spatial fast path).
    h_pad = (0, hp - h) if nxt_h_haloed else (r, r + (hp - h))
    nxt_t = jnp.pad(
        nxt_t, ((0, 0), (0, 0), h_pad, (r, wp - w - r))
    )
    kernel = functools.partial(
        _cv_bwd_prv_kernel, r=r, th=th, w=w, inv_c=1.0 / c
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, w), jnp.float32),
        grid=(b, hp // th),
        in_specs=[
            pl.BlockSpec((1, d * d, th, w), lambda bi, ti: (bi, 0, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, th, w), lambda bi, ti: (bi, 0, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((c, th + 2 * r, wp), nxt_t.dtype),
            pltpu.VMEM((c, th + 2 * r, w), nxt_t.dtype),
            pltpu.VMEM((c, th, w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(dacc_t, nxt_t)
    return _to_hwc(out[:, :, :h, :])


@functools.partial(
    jax.jit,
    static_argnames=("search_range", "tile_h", "interpret",
                     "h_haloed_out"),
)
def _cv_bwd_nxt_impl(dacc, prv, search_range=4, tile_h=None,
                     interpret=False, h_haloed_out=False):
    """d(cost)/d(nxt). h_haloed_out=True additionally emits the gradient
    rows for the r halo rows above and below the image (output shape
    (B, H + 2r, W, C)) — the spatial fast path's nxt carries those rows.
    Derivation: dnxt[u] for u in [-r, H + r) needs (dacc·prv) products at
    rows u + 2r - di, so the operands are padded by 2r (instead of r) and
    the output row count grows by 2r; rows outside [0, H) contribute
    zeros exactly as in the zero-padded formulation."""
    r = search_range
    d = 2 * r + 1
    b, h, w, c = prv.shape
    wp = ((w + 2 * r + 127) // 128) * 128
    itemsize = max(dacc.dtype.itemsize, prv.dtype.itemsize)
    out_h = h + 2 * r if h_haloed_out else h
    th = tile_h or _pick_tile_h_bwd(
        out_h, w, c, d, itemsize, r, dacc_halo=True)
    th = min(th, max(8, ((out_h + 7) // 8) * 8))
    hp = ((out_h + th - 1) // th) * th

    pad_lo = 2 * r if h_haloed_out else r
    h_pad = (pad_lo, pad_lo + (hp - out_h))
    dacc_t = jnp.pad(
        _to_chw(dacc),
        ((0, 0), (0, 0), h_pad, (r, wp - w - r)),
    )
    prv_t = jnp.pad(
        _to_chw(prv),
        ((0, 0), (0, 0), h_pad, (r, wp - w - r)),
    )
    kernel = functools.partial(
        _cv_bwd_nxt_kernel, r=r, th=th, w=w, inv_c=1.0 / c
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, c, hp, w), jnp.float32),
        grid=(b, hp // th),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, th, w), lambda bi, ti: (bi, 0, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((d * d, th + 2 * r, wp), dacc_t.dtype),
            pltpu.VMEM((c, th + 2 * r, wp), prv_t.dtype),
            pltpu.VMEM((d * d, th + 2 * r, w), dacc_t.dtype),
            pltpu.VMEM((c, th + 2 * r, w), prv_t.dtype),
            pltpu.VMEM((c, th, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(dacc_t, prv_t)
    return _to_hwc(out[:, :, :out_h, :])


@functools.partial(
    jax.jit,
    static_argnames=("search_range", "tile_h", "interpret",
                     "nxt_h_haloed"),
)
def _cost_volume_pallas_impl(
    prv: jax.Array,
    nxt: jax.Array,
    search_range: int = 4,
    tile_h: int | None = None,
    interpret: bool = False,
    nxt_h_haloed: bool = False,
) -> jax.Array:
    r = search_range
    d = 2 * r + 1
    b, h, w, c = prv.shape
    itemsize = prv.dtype.itemsize
    wp_for = lambda width: ((width + 2 * r + 127) // 128) * 128  # noqa: E731

    if tile_h is None:
        # Exact VMEM budget: prv and out blocks are double-buffered by the
        # pallas pipeline; the haloed nxt scratch is single-buffered but
        # lane-padded to wp. Stay under ~12 MB of the 16 MB core VMEM.
        budget = 10 * 1024 * 1024
        w_lane = ((w + 127) // 128) * 128  # VMEM lane padding
        sub = 16 if itemsize < 4 else 8    # sublane multiple
        rup = lambda x: ((x + sub - 1) // sub) * sub  # noqa: E731
        tile_h = 8
        for cand in range(256, 7, -8):
            thp = rup(cand)
            need = (
                2 * itemsize * c * thp * w_lane          # prv block x2
                + 2 * itemsize * d * d * thp * w_lane    # out block x2
                + itemsize * c * rup(cand + 2 * r) * wp_for(w)  # scratch
                + itemsize * c * rup(cand + 2 * r) * w_lane  # shift buffer
                + itemsize * c * thp * w_lane            # product temp
                + 2 * 4 * thp * w_lane                   # f32 acc tiles
            )
            if need <= budget:
                tile_h = cand
                break
    th = min(tile_h, max(8, ((h + 7) // 8) * 8))

    hp = ((h + th - 1) // th) * th
    n_tiles = hp // th

    # (B, C, H, W) internal layout; zero-pad H to the tile multiple and the
    # halo, W by the halo. The haloed width is padded up to a lane multiple
    # (128) because HBM->VMEM DMA slices must be 128-aligned in the last
    # dim (Mosaic tiling constraint).
    wp = wp_for(w)
    prv_t = _to_chw(prv)
    nxt_t = _to_chw(nxt)
    if hp != h:
        prv_t = jnp.pad(prv_t, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    # H halo: zero-padded here, or supplied by the caller (spatial path).
    h_pad = (0, hp - h) if nxt_h_haloed else (r, r + (hp - h))
    nxt_t = jnp.pad(
        nxt_t,
        ((0, 0), (0, 0), h_pad, (r, wp - w - r)),
    )

    kernel = functools.partial(
        _cv_kernel, r=r, th=th, w=w, inv_c=1.0 / c
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d * d, hp, w), prv.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, c, th, w),
                lambda bi, ti: (bi, 0, ti, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, d * d, th, w),
            lambda bi, ti: (bi, 0, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((c, th + 2 * r, wp), nxt_t.dtype),
            pltpu.VMEM((c, th + 2 * r, w), nxt_t.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(prv_t, nxt_t)

    return _to_hwc(out[:, :, :h, :])
