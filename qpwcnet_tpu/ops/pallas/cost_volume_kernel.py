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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cv_kernel(prv_ref, nxt_hbm, out_ref, scratch, sem, *, r: int, th: int,
               w: int, inv_c: float):
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
    for di in range(d):
        for dj in range(d):
            # (A roll-based shifted-window variant was tried to avoid
            # per-displacement relayouts, but Mosaic unrolled it into a
            # >4GB executable; static slices compile compactly.)
            roi = scratch[:, di:di + th, dj:dj + w]
            # f32 accumulator via the sum dtype — avoids materializing
            # full f32 copies of the tiles on the Mosaic stack.
            acc = jnp.sum(prv * roi, axis=0, dtype=jnp.float32) * inv_c
            out_ref[0, di * d + dj] = jnp.where(
                acc > 0, acc, 0.1 * acc
            ).astype(out_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def cost_volume_pallas(
    prv: jax.Array,
    nxt: jax.Array,
    search_range: int = 4,
    tile_h: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused cost volume. prv, nxt: (B, H, W, C) -> (B, H, W, (2r+1)²).

    Semantics identical to cost_volume_xla (zero-padded nxt, channel-mean
    correlation, leaky_relu(0.1)). Differentiable: the backward pass
    reuses the XLA formulation's VJP (pallas_call has no JVP rule); a
    dedicated backward kernel is a future optimization.
    """
    return _cost_volume_pallas_impl(
        prv, nxt, search_range=search_range, tile_h=tile_h,
        interpret=interpret,
    )


def _cv_pallas_fwd(prv, nxt, search_range, tile_h, interpret):
    out = _cost_volume_pallas_impl(
        prv, nxt, search_range=search_range, tile_h=tile_h,
        interpret=interpret,
    )
    return out, (prv, nxt)


def _cv_pallas_bwd(search_range, tile_h, interpret, res, g):
    from qpwcnet_tpu.ops.cost_volume import cost_volume_xla

    prv, nxt = res
    _, vjp = jax.vjp(
        lambda p, n: cost_volume_xla(p, n, search_range), prv, nxt
    )
    return vjp(g)


cost_volume_pallas.defvjp(_cv_pallas_fwd, _cv_pallas_bwd)


@functools.partial(
    jax.jit, static_argnames=("search_range", "tile_h", "interpret")
)
def _cost_volume_pallas_impl(
    prv: jax.Array,
    nxt: jax.Array,
    search_range: int = 4,
    tile_h: int | None = None,
    interpret: bool = False,
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
    prv_t = prv.transpose(0, 3, 1, 2)
    nxt_t = nxt.transpose(0, 3, 1, 2)
    if hp != h:
        prv_t = jnp.pad(prv_t, ((0, 0), (0, 0), (0, hp - h), (0, 0)))
    nxt_t = jnp.pad(
        nxt_t,
        ((0, 0), (0, 0), (r, r + (hp - h)), (r, wp - w - r)),
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
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(prv_t, nxt_t)

    out = out[:, :, :h, :]
    return out.transpose(0, 2, 3, 1)
