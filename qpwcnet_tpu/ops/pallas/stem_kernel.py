"""Fused encoder-stem Pallas kernel: one whole DownConv stage
(Conv3x3/s2 + Mish -> Conv3x3 + Mish -> Conv3x3 + Mish,
qpwcnet/core/layers.py:498-571) in a single VMEM-resident kernel.

Why (round 4/5 attribution, artifacts/enc_hlo.py + DESIGN.md): XLA:TPU
assigns the low-channel stem convs lane-major C layouts — C=16 padded
8x to 128 lanes — and refuses to fuse the Mish activations into the
conv fusions, so every logical-58.7 MB stage-0 feature map materializes
as 469.8 MB plus relayout copies; the encoder accesses 8.1 GB for
~1 GB of logical tensors. Two numerically-exact JAX-level re-spellings
(space-to-depth stem, batch-in-channels grouped convs) were measured
SLOWER because layout assignment re-introduces the padding. This kernel
removes the layout problem instead of re-spelling around it:

  * Activations live in VMEM as 2-D ``(C, P)`` buffers with C on the
    SUBLANE axis (never lane-padded) and a flattened spatial axis
    ``P = rows * (W + 2)`` on lanes — each row padded with one zero
    halo column per side so every conv tap is a pure lane-shifted
    slice (the same static-slice structure as the production
    cost-volume kernel).
  * Convs are im2col + MXU dots: tap k of conv i copies the shifted
    slice into rows ``[k*C, (k+1)*C)`` of an ``(K, P)`` im2col buffer
    (sublane-aligned: C is a multiple of 16), then one
    ``(C_out, K) @ (K, P)`` dot with f32 accumulation computes the
    whole tile's conv. K = 9*C_in (4*C_phases for the stride-2 conv)
    keeps the MXU's contraction dim deep.
  * The stride-2 conv_a runs in its space-to-depth spelling
    (qlayers._s2d_conv derivation: 3x3/s2 SAME == 2x2/s1 on the
    factor-2 s2d input with pad (0,1)) so all three convs are
    stride-1 over the SAME output-resolution flattened grid. The
    phase transform happens OUTSIDE the kernel in C-major (B, 4C,
    H/2, W/2) layout, where C is not the minor dim and therefore not
    lane-padded. The kernel param keeps the reference (3,3,Ci,Co)
    shape — the rearrange is per call, so checkpoints transfer.
  * Bias + Mish (exact ops/activations.py formulation) + a
    validity mask run on the dot result in VMEM; the three convs chain
    without touching HBM. Per-stage HBM traffic = read input + write
    output, i.e. the logical bytes.

Masks: conv outputs at halo-column / out-of-image-row positions are NOT
zero (bias + mish(bias) != 0, and halo lanes compute garbage from
neighboring rows), but the NEXT conv's SAME zero-padding requires them
to be zero — each conv's result is multiplied by a precomputed 0/1
plane (per grid row-tile, passed as a kernel input; tile-dependent
because image-boundary rows differ per tile).

Forward-only (inference fast path); :func:`downconv_stage_trainable`
pairs this forward with the exact unfused composition's VJP
(checkpoint-style recompute), the same pattern as
warp_cv_kernel.warp_cost_volume_trainable.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpwcnet_tpu.ops.activations import mish
from qpwcnet_tpu.ops.pallas.cost_volume_kernel import _to_hwc


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _phase_input(x: jax.Array, c_pad: int) -> jax.Array:
    """(B, H, W, C) NHWC -> (B, c_pad, H/2, W/2) C-major space-to-depth
    phases, channel index c*4 + r*2 + s (matching qlayers._s2d_conv's
    kernel rearrangement), zero-padded to c_pad channels."""
    b, h, w, c = x.shape
    y = x.reshape(b, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 5, 2, 4, 1, 3).reshape(b, 4 * c, h // 2, w // 2)
    if c_pad > 4 * c:
        y = jnp.pad(y, ((0, 0), (0, c_pad - 4 * c), (0, 0), (0, 0)))
    return y


def _w1_matrix(kernel: jax.Array, c_pad: int) -> jax.Array:
    """(3, 3, Ci, Co) HWIO stride-2 kernel -> (Co, 4 * c_pad) s2d tap
    matrix, row k*c_pad + cc = k2[dy, dx, cc] for tap k = dy*2 + dx."""
    c, f = kernel.shape[2], kernel.shape[3]
    kpad = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
    k2 = kpad.reshape(2, 2, 2, 2, c, f)             # (dp, r, dq, s, c, f)
    k2 = k2.transpose(0, 2, 4, 1, 3, 5).reshape(2, 2, 4 * c, f)
    if c_pad > 4 * c:
        k2 = jnp.pad(k2, ((0, 0), (0, 0), (0, c_pad - 4 * c), (0, 0)))
    return k2.transpose(3, 0, 1, 2).reshape(f, 4 * c_pad)


def _w33_matrix(kernel: jax.Array) -> jax.Array:
    """(3, 3, C, Co) HWIO -> (Co, 9C) tap matrix, tap k = dy*3 + dx."""
    c, f = kernel.shape[2], kernel.shape[3]
    return kernel.transpose(3, 0, 1, 2).reshape(f, 9 * c)


def _mask(t: int, tile_rows: int, d: int, pad_rows: int, lf: int,
          wv: int, h: int, w: int) -> np.ndarray:
    """0/1 plane for conv output rows [t*TR - d, t*TR + TR + d) in the
    flat layout (top pad `pad_rows` dummy rows): lane (pad_rows + m)*wv
    + 1 + l is valid iff col l < w and row t*TR - d + m in [0, h)."""
    m = np.zeros((lf,), np.float32)
    for mm in range(tile_rows + 2 * d):
        row = t * tile_rows - d + mm
        if 0 <= row < h:
            base = (pad_rows + mm) * wv + 1
            m[base:base + w] = 1.0
    return m


def _stem_kernel(x_hbm, w1, b1, m1, w2, b2, m2, w3, b3, m3, out_ref,
                 src, flat0, imcol1, flat1, imcol2, flat2, imcol3, sem,
                 *, tr: int, w: int, geom):
    """Grid (B, T). geom: dict of static layout constants (see
    downconv_stage_pallas)."""
    wv = w + 2
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * tr, src.shape[1]), :], src, sem,
    )
    dma.start()
    dma.wait()

    # ---- flat0: zero halo layout of the (phase) input tile ----------
    flat0[:] = jnp.zeros_like(flat0)
    p0 = geom["pad0"]
    for m in range(geom["r0"]):
        base = (p0 + m) * wv + 1
        flat0[:, base:base + w] = src[:, m, :]

    def conv(imcol, flat_src, taps, wmat, bias, mask, off_base, lf_t):
        for k, (dy, dx) in enumerate(taps):
            off = off_base(dy, dx)
            c_in = flat_src.shape[0]
            imcol[k * c_in:(k + 1) * c_in, :] = (
                flat_src[:, off:off + lf_t])
        acc = jax.lax.dot_general(
            wmat[:], imcol[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = acc.astype(out_ref.dtype) + bias[:]
        return mish(y) * mask[0]

    # ---- conv_a: 2x2 s2d taps (dy, dx >= 0) -------------------------
    taps1 = [(dy, dx) for dy in range(2) for dx in range(2)]
    d01 = geom["pad0"] - geom["pad1"]
    flat1[:] = conv(
        imcol1, flat0, taps1, w1, b1, m1,
        lambda dy, dx: (d01 + dy) * wv + dx, geom["lf1"])

    # ---- conv_aa / conv_b: 3x3 SAME taps ----------------------------
    taps33 = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    d12 = geom["pad1"] - geom["pad2"]
    flat2[:] = conv(
        imcol2, flat1, taps33, w2, b2, m2,
        lambda dy, dx: (d12 + 1 + dy) * wv + dx, geom["lf2"])

    d23 = geom["pad2"] - geom["pad3"]
    a3 = conv(
        imcol3, flat2, taps33, w3, b3, m3,
        lambda dy, dx: (d23 + 1 + dy) * wv + dx, geom["lf3"])

    p3 = geom["pad3"]
    for m in range(tr):
        base = (p3 + m) * wv + 1
        out_ref[0, :, m, :] = a3[:, base:base + w]


@functools.partial(
    jax.jit,
    static_argnames=("dtype_name", "tile_rows", "interpret"),
)
def _stage_impl(x, ka, ba, kaa, baa, kb, bb, dtype_name: str,
                tile_rows: int, interpret: bool):
    dtype = jnp.dtype(dtype_name)
    b, h, w_in, c_in = x.shape
    assert h % 2 == 0 and w_in % 2 == 0, (h, w_in)
    hs, w = h // 2, w_in // 2
    co = ka.shape[-1]
    assert kaa.shape == (3, 3, co, co) and kb.shape == (3, 3, co, co)
    # Mosaic rejects HBM->VMEM DMA slices whose minor dim is not a
    # multiple of the 128-lane tiling (caught by the bench equality
    # gate at W=64; interpret mode does not enforce it). Run the whole
    # kernel at a lane-aligned working width: the padded input columns
    # are zeros, the masks (built from the REAL w) zero every computed
    # value at col >= w after each conv, so the zero-pad SAME semantics
    # are preserved exactly; the output is trimmed at the end.
    wp = _round_up(w, 128)
    wv = wp + 2

    c_pad = _round_up(4 * c_in, 16)
    xp = _phase_input(x.astype(dtype), c_pad)
    if wp != w:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, wp - w)))

    tr = tile_rows
    t = max(1, -(-hs // tr))
    hp = t * tr

    # Flat-layout geometry. Row counts per conv output (top+bottom
    # halo d): conv1 d=2, conv2 d=1, conv3 d=0. Top dummy-row pads must
    # DECREASE by >=1 across each 3x3 conv (so the dy=-1, dx=-1 tap's
    # slice offset stays non-negative); bottom slack rows likewise
    # cover the dy=+1 taps' overreach.
    r1, r2, r3 = tr + 4, tr + 2, tr
    r0 = tr + 5                      # conv1 input rows [t0-2, t0+tr+3)
    pad3, pad2, pad1, pad0 = 1, 2, 3, 3
    lf3 = (pad3 + r3 + 1) * wv
    lf2 = (pad2 + r2 + 2) * wv       # >= (pad2-pad3+2)*wv + lf3
    lf1 = (pad1 + r1 + 3) * wv
    lf0 = (pad0 + r0 + 4) * wv
    assert (pad2 - pad3 + 2) * wv + 1 + lf3 <= lf2
    assert (pad1 - pad2 + 2) * wv + 1 + lf2 <= lf1
    assert (pad0 - pad1 + 1) * wv + 1 + lf1 <= lf0

    # Input rows [i*tr - 2, i*tr + tr + 3): pad the phase input by 2 on
    # top; DMA extents are sublane-rounded, so pad the bottom to cover
    # the last tile's full extent.
    rs = _round_up(r0, 16)
    pad_bot = (t - 1) * tr + rs - 2 - hs
    xp = jnp.pad(xp, ((0, 0), (0, 0), (2, pad_bot), (0, 0)))

    k1 = _w1_matrix(ka.astype(dtype), c_pad)            # (co, 4*c_pad)
    k2 = _w33_matrix(kaa.astype(dtype))                 # (co, 9*co)
    k3 = _w33_matrix(kb.astype(dtype))
    b1 = ba.astype(dtype)[:, None]
    b2 = baa.astype(dtype)[:, None]
    b3 = bb.astype(dtype)[:, None]

    masks = []
    for lf, d in ((lf1, 2), (lf2, 1), (lf3, 0)):
        pad_rows = {2: pad1, 1: pad2, 0: pad3}[d]
        mk = np.stack([
            _mask(ti, tr, d, pad_rows, lf, wv, hs, w) for ti in range(t)
        ])[:, None, :]
        masks.append(jnp.asarray(mk, dtype))
    m1a, m2a, m3a = masks

    geom = dict(pad0=pad0, pad1=pad1, pad2=pad2, pad3=pad3,
                r0=r0, lf1=lf1, lf2=lf2, lf3=lf3)

    def kernel_fn(*refs):
        return _stem_kernel(*refs, tr=tr, w=wp, geom=geom)

    const = lambda *_: (0, 0)  # noqa: E731
    const3 = lambda bi, ti: (ti, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, co, hp, wp), dtype),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                  # x
            pl.BlockSpec((co, 4 * c_pad), const,
                         memory_space=pltpu.VMEM),              # w1
            pl.BlockSpec((co, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lf1), const3,
                         memory_space=pltpu.VMEM),              # m1
            pl.BlockSpec((co, 9 * co), const,
                         memory_space=pltpu.VMEM),              # w2
            pl.BlockSpec((co, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lf2), const3,
                         memory_space=pltpu.VMEM),              # m2
            pl.BlockSpec((co, 9 * co), const,
                         memory_space=pltpu.VMEM),              # w3
            pl.BlockSpec((co, 1), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lf3), const3,
                         memory_space=pltpu.VMEM),              # m3
        ],
        out_specs=pl.BlockSpec(
            (1, co, tr, wp), lambda bi, ti: (bi, 0, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((c_pad, rs, wp), dtype),      # src
            pltpu.VMEM((c_pad, lf0), dtype),         # flat0
            pltpu.VMEM((4 * c_pad, lf1), dtype),     # imcol1
            pltpu.VMEM((co, lf1), dtype),            # flat1
            pltpu.VMEM((9 * co, lf2), dtype),        # imcol2
            pltpu.VMEM((co, lf2), dtype),            # flat2
            pltpu.VMEM((9 * co, lf3), dtype),        # imcol3
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, k1, b1, m1a, k2, b2, m2a, k3, b3, m3a)
    return _to_hwc(out[:, :, :hs, :w])


def _default_tile_rows() -> int:
    """Row-tile default, overridable via QPWCNET_STEM_TILE for layout
    experiments (static arg: each value is a separate compile).
    Measured: 112 is A/B-equal to 32 on the 448x1024 headline (65.31
    vs 65.30 ms, artifacts/ab_stem) — the halo-recompute fraction is
    not the binding term — so the VMEM-lighter 32 stays default."""
    import os

    return int(os.environ.get("QPWCNET_STEM_TILE", "32"))


def downconv_stage_pallas(
    x: jax.Array,
    params: dict,
    dtype=jnp.bfloat16,
    tile_rows: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused DownConv stage forward.

    Args:
      x: (B, H, W, Cin) NHWC input (H, W even).
      params: the stage's param subtree
        {'conv_a': {'kernel', 'bias'}, 'conv_aa': ..., 'conv_b': ...}
        with reference HWIO (3,3,Ci,Co) kernels — the same tree QConv
        trains.
      dtype: compute dtype (matches blocks.DownConv's QConv path:
        conv + bias + mish all in this dtype, f32 accumulation inside
        the dots).

    Returns: (B, H/2, W/2, Co) NHWC, numerically matching
      DownConv(use_normalizer=False).apply to compute-dtype tolerance.
    """
    return _stage_impl(
        x,
        params["conv_a"]["kernel"], params["conv_a"]["bias"],
        params["conv_aa"]["kernel"], params["conv_aa"]["bias"],
        params["conv_b"]["kernel"], params["conv_b"]["bias"],
        dtype_name=jnp.dtype(dtype).name,
        tile_rows=tile_rows or _default_tile_rows(),
        interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _trainable_stage(dtype_name: str, tile_rows: int, interpret: bool):
    """Custom-VJP wrapper: fused Pallas forward, backward through the
    exact unfused conv composition (recomputed, checkpoint-style) —
    the same pattern as warp_cv_kernel.warp_cost_volume_trainable."""
    from qpwcnet_tpu.quantize.qlayers import _s2d_conv

    dtype = jnp.dtype(dtype_name)

    def unfused(x, ka, ba, kaa, baa, kb, bb):
        y = _s2d_conv(x.astype(dtype), ka.astype(dtype))
        y = mish(y + ba.astype(y.dtype))
        for k, bias in ((kaa, baa), (kb, bb)):
            y = jax.lax.conv_general_dilated(
                y, k.astype(dtype), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = mish(y + bias.astype(y.dtype))
        return y

    @jax.custom_vjp
    def fused(x, ka, ba, kaa, baa, kb, bb):
        return _stage_impl(x, ka, ba, kaa, baa, kb, bb,
                           dtype_name=dtype_name,
                           tile_rows=tile_rows, interpret=interpret)

    def fwd(*args):
        return fused(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(unfused, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def downconv_stage_trainable(
    x: jax.Array,
    params: dict,
    dtype=jnp.bfloat16,
    tile_rows: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """:func:`downconv_stage_pallas` with a custom VJP (exact unfused
    composition's gradients, warp recompute-style)."""
    return _trainable_stage(jnp.dtype(dtype).name,
                            tile_rows or _default_tile_rows(),
                            interpret)(
        x,
        params["conv_a"]["kernel"], params["conv_a"]["bias"],
        params["conv_aa"]["kernel"], params["conv_aa"]["bias"],
        params["conv_b"]["kernel"], params["conv_b"]["bias"],
    )
