"""Fused UpConv (ConvTranspose 4x4/s2 + Mish, qpwcnet layers.py:255-282)
Pallas kernel — the decoder analog of the encoder stem kernel
(stem_kernel.py): the decoder's trailing stages emit C=32/16 feature
maps that XLA:TPU lane-pads 4-8x with relayout copies, same pathology
as the encoder stem.

Phase decomposition (verified empirically against lax.conv_transpose
SAME semantics, the exact path of quantize.qlayers.QConvTranspose)::

    y[2i+r, 2j+s] = sum_{a,b in {0,1}}
        x[i + a - (1-r), j + b - (1-s)] * k[2a + r, 2b + s]

Every output phase (r, s) is a 2x2-tap stride-1 conv over the SAME
3x3 input neighborhood, so the kernel builds ONE 9-tap im2col
(K = 9*C_in, the flattened-lane layout of stem_kernel) and runs FOUR
(C_out, 9C_in) MXU dots — each phase's tap matrix is zero outside its
four taps. Phase interleave to (2H, 2W) happens outside in C-major
layout (no lane padding there). Bias + Mish + validity mask fused.

Forward-only; :func:`upconv_stage_trainable` adds the exact-VJP
wrapper (unfused lax.conv_transpose composition, recomputed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from qpwcnet_tpu.ops.activations import mish
from qpwcnet_tpu.ops.pallas.cost_volume_kernel import _to_chw, _to_hwc
from qpwcnet_tpu.ops.pallas.stem_kernel import _mask, _round_up


def _phase_matrices(kernel: jax.Array) -> jax.Array:
    """(4, 4, Ci, Co) HWIO transpose-conv kernel -> (4, Co, 9*Ci) tap
    matrices, phase ph = r*2 + s, tap t = (dy+1)*3 + (dx+1), entry =
    k[2*dy + 2 - r, 2*dx + 2 - s] where the index is in [0, 4)."""
    ci, co = kernel.shape[2], kernel.shape[3]
    mats = jnp.zeros((4, co, 9, ci), kernel.dtype)
    for r in range(2):
        for s in range(2):
            for dy in (-1, 0, 1):
                my = 2 * dy + 2 - r
                if not 0 <= my < 4:
                    continue
                for dx in (-1, 0, 1):
                    mx = 2 * dx + 2 - s
                    if not 0 <= mx < 4:
                        continue
                    t = (dy + 1) * 3 + (dx + 1)
                    mats = mats.at[r * 2 + s, :, t, :].set(
                        kernel[my, mx].T)
    return mats.reshape(4, co, 9 * ci)


def _upconv_kernel(x_hbm, wm, b1, m1, out_ref, src, flat0, imcol, sem,
                   *, tr: int, w: int, geom):
    """Grid (B, T). out_ref block: (1, 4, co, tr, w)."""
    wv = w + 2
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(i * tr, src.shape[1]), :], src, sem,
    )
    dma.start()
    dma.wait()

    # flat input: rows [t0-1, t0+tr+1), zero halo cols.
    flat0[:] = jnp.zeros_like(flat0)
    p0 = geom["pad0"]
    for m in range(geom["r0"]):
        base = (p0 + m) * wv + 1
        flat0[:, base:base + w] = src[:, m, :]

    c_in = flat0.shape[0]
    d01 = geom["pad0"] - geom["pad1"]
    taps = [(dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)]
    for k, (dy, dx) in enumerate(taps):
        off = (d01 + 1 + dy) * wv + dx
        imcol[k * c_in:(k + 1) * c_in, :] = (
            flat0[:, off:off + geom["lf1"]])

    p1 = geom["pad1"]
    for ph in range(4):
        acc = jax.lax.dot_general(
            wm[ph], imcol[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        y = mish(acc.astype(out_ref.dtype) + b1[:]) * m1[0]
        for m in range(tr):
            base = (p1 + m) * wv + 1
            out_ref[0, ph, :, m, :] = y[:, base:base + w]


@functools.partial(
    jax.jit,
    static_argnames=("dtype_name", "tile_rows", "interpret"),
)
def _upconv_impl(x, kernel, bias, dtype_name: str, tile_rows: int,
                 interpret: bool):
    dtype = jnp.dtype(dtype_name)
    b, h, w, ci = x.shape
    co = kernel.shape[-1]
    assert kernel.shape == (4, 4, ci, co), kernel.shape

    wp = _round_up(w, 128)
    wv = wp + 2
    tr = min(tile_rows, max(8, _round_up(h, 8)))
    t = max(1, -(-h // tr))
    hp = t * tr

    xp = _to_chw(x.astype(dtype))
    if wp != w:
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, wp - w)))

    # flat geometry: output rows [t0, t0+tr) (pad1 dummy top rows),
    # input rows [t0-1, t0+tr+1) (pad0; pad0 >= pad1 + 1 for dy=-1).
    r0 = tr + 2
    pad1, pad0 = 1, 2
    lf1 = (pad1 + tr + 1) * wv
    lf0 = (pad0 + r0 + 2) * wv
    assert (pad0 - pad1 + 2) * wv + 1 + lf1 <= lf0

    rs = _round_up(r0, 16)
    pad_bot = (t - 1) * tr + rs - 1 - h
    xp = jnp.pad(xp, ((0, 0), (0, 0), (1, pad_bot), (0, 0)))

    wm = _phase_matrices(kernel.astype(dtype))           # (4, co, 9ci)
    b1 = bias.astype(dtype)[:, None]
    mk = np.stack([
        _mask(ti, tr, 0, pad1, lf1, wv, h, w) for ti in range(t)
    ])[:, None, :]
    m1 = jnp.asarray(mk, dtype)

    geom = dict(pad0=pad0, pad1=pad1, r0=r0, lf1=lf1)

    def kernel_fn(*refs):
        return _upconv_kernel(*refs, tr=tr, w=wp, geom=geom)

    const = lambda *_: (0, 0, 0)  # noqa: E731
    out = pl.pallas_call(
        kernel_fn,
        out_shape=jax.ShapeDtypeStruct((b, 4, co, hp, wp), dtype),
        grid=(b, t),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),               # x
            pl.BlockSpec((4, co, 9 * ci), const,
                         memory_space=pltpu.VMEM),           # wm
            pl.BlockSpec((co, 1), lambda *_: (0, 0),
                         memory_space=pltpu.VMEM),           # bias
            pl.BlockSpec((1, 1, lf1), lambda bi, ti: (ti, 0, 0),
                         memory_space=pltpu.VMEM),           # mask
        ],
        out_specs=pl.BlockSpec(
            (1, 4, co, tr, wp), lambda bi, ti: (bi, 0, 0, ti, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((ci, rs, wp), dtype),      # src
            pltpu.VMEM((ci, lf0), dtype),         # flat0
            pltpu.VMEM((9 * ci, lf1), dtype),     # imcol
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, wm, b1, m1)

    # (B, r*2+s, C, Hp, Wp) -> trim -> interleave phases -> NHWC.
    out = out[:, :, :, :h, :w].reshape(b, 2, 2, co, h, w)
    out = out.transpose(0, 3, 4, 1, 5, 2).reshape(b, co, 2 * h, 2 * w)
    return _to_hwc(out)


def upconv_stage_pallas(
    x: jax.Array,
    params: dict,
    dtype=jnp.bfloat16,
    tile_rows: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """Fused UpConv stage forward.

    Args:
      x: (B, H, W, Cin) NHWC.
      params: {'conv_up': {'kernel' (4,4,Ci,Co), 'bias'}} — the same
        tree QConvTranspose trains.
    Returns: (B, 2H, 2W, Co) NHWC == QConvTranspose(act=mish) to
      compute-dtype tolerance.
    """
    return _upconv_impl(
        x, params["conv_up"]["kernel"], params["conv_up"]["bias"],
        dtype_name=jnp.dtype(dtype).name,
        tile_rows=tile_rows, interpret=interpret,
    )


@functools.lru_cache(maxsize=None)
def _trainable_upconv(dtype_name: str, tile_rows: int, interpret: bool):
    dtype = jnp.dtype(dtype_name)

    def unfused(x, kernel, bias):
        y = jax.lax.conv_transpose(
            x.astype(dtype), kernel.astype(dtype), (2, 2), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return mish(y + bias.astype(y.dtype))

    @jax.custom_vjp
    def fused(x, kernel, bias):
        return _upconv_impl(x, kernel, bias, dtype_name=dtype_name,
                            tile_rows=tile_rows, interpret=interpret)

    def fwd(*args):
        return fused(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(unfused, *res)
        return vjp(g)

    fused.defvjp(fwd, bwd)
    return fused


def upconv_stage_trainable(
    x: jax.Array,
    params: dict,
    dtype=jnp.bfloat16,
    tile_rows: int = 32,
    interpret: bool = False,
) -> jax.Array:
    """:func:`upconv_stage_pallas` with the exact unfused composition's
    VJP (recomputed, checkpoint-style)."""
    return _trainable_upconv(jnp.dtype(dtype).name, tile_rows,
                             interpret)(
        x, params["conv_up"]["kernel"], params["conv_up"]["bias"])
