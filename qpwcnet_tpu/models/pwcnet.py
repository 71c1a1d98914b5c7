"""PWC-Net-family model builders (Flax linen, NHWC).

Ports of qpwcnet/core/pwcnet.py:
  * :class:`Encoder`   — encoder()   (pwcnet.py:134-168)
  * :class:`Decoder`   — decoder()   (pwcnet.py:171-207)
  * :class:`Flower`    — flower() / Flower (pwcnet.py:28-67,
                          non_layers.py:452-499)
  * :class:`PWCFlowNet`      — build_flower()       (pwcnet.py:210-244)
  * :class:`PWCInterpolator` — build_interpolator() (pwcnet.py:247-287)

Structural parity notes:
  * The encoder/decoder stages are SHARED between the two frames (siamese;
    pwcnet.py:152-162).
  * The interpolator reuses ONE Flower block for both flow directions
    (pwcnet.py:270-280), with the argument orders of the reference
    preserved exactly: flows_01 <- Flower(enc_nxt, enc_prv, decs_nxt,
    decs_prv), flows_10 <- Flower(enc_prv, enc_nxt, decs_prv, decs_nxt).
  * Weight transfer between PWCFlowNet and PWCInterpolator is by param
    subtree ('encoder', 'decoder', 'flower'), replacing the reference's
    fragile by-name HDF5 matching (train/util.py:23-54); see
    qpwcnet_tpu.train.checkpoint.transfer_params.
  * Upsample scale: every inter-level flow upsample doubles magnitude
    (scale=2.0) INCLUDING the final one — deliberately fixing the
    reference's silent `sacle=2.0` kwarg typo (non_layers.py:468) whose
    functional twin (pwcnet.py:60) uses the correct 2.0. Documented
    behavioral decision (SURVEY.md §2.1).
  * Flow convention: (x, y) channel order; flo_01 is forward flow with
    warp(nxt, flo_01) == prv (pwcnet.py:38).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from qpwcnet_tpu.models.blocks import (
    DownConv,
    UpConv,
    FlowBlock,
    UpFlowBlock,
    FrameInterpolate,
)
from qpwcnet_tpu.quantize.fake_quant import QuantConfig
from qpwcnet_tpu.ops.resize import upsample2x_bilinear, avg_pool_2x

ENCODER_FILTERS = (16, 32, 64, 128, 256)
DECODER_FILTERS = (128, 64, 32, 16)


class Encoder(nn.Module):
    """Siamese 5-stage feature pyramid; strides 1/2..1/32. No normalizer —
    AGC replaces batchnorm (pwcnet.py:142-146)."""

    filters: Sequence[int] = ENCODER_FILTERS
    dtype: Any = jnp.float32
    quant: QuantConfig | None = None
    # First s2d_stages stages run their stride-2 conv in the exact
    # space-to-depth spelling (blocks.DownConv.s2d) — the fix for the
    # measured GB-scale relayout copies around the low-C stem convs.
    # MEASURED SLOWER (DESIGN.md round 5); kept as the documented
    # negative result. Default 0.
    s2d_stages: int = 0
    # First stem_stages stages run as ONE fused Pallas kernel each
    # (ops/pallas/stem_kernel.py): compact (C, flat-spatial) VMEM
    # layout + im2col MXU dots — the fix that dodges XLA:TPU's
    # lane-padded conv layouts entirely instead of re-spelling the
    # convs. Float path only (the int8 chain keeps its own conv);
    # train=True uses the custom-VJP wrapper (exact unfused gradients).
    stem_stages: int = 0

    def setup(self):
        self.stages = [
            DownConv(f, use_normalizer=False, dtype=self.dtype,
                     quant=self.quant, s2d=(i < self.s2d_stages),
                     name=f"stage_{i}")
            for i, f in enumerate(self.filters)
        ]

    def __call__(self, img, train: bool = False):
        """img: (B, H, W, 3) -> list of len(filters)+1 features, index 0 is
        the input itself (pwcnet.py:152-156)."""
        from qpwcnet_tpu.models.blocks import _int8_mode
        from qpwcnet_tpu.quantize.qtensor import dequantize

        feats = [img]
        f = img.astype(self.dtype)
        # int8 execution: DownConv stages chain QTensors (int8 values +
        # scale, 1 byte/element between stages); the pyramid features
        # handed to the decoder / cost volume / warp are dequantized
        # views (those consumers are float ops).
        chain_q = _int8_mode(self.quant)
        for i, stage in enumerate(self.stages):
            if (i < self.stem_stages and not chain_q
                    and not self.is_initializing()):
                from qpwcnet_tpu.ops.pallas.stem_kernel import (
                    downconv_stage_pallas,
                    downconv_stage_trainable,
                )

                # Same param subtree the QConv path trains — the fused
                # kernel reads it without calling the stage module, so
                # checkpoints are identical in both modes.
                p = self.get_variable("params", f"stage_{i}")
                op = (downconv_stage_trainable if train
                      else downconv_stage_pallas)
                f = op(f, p, dtype=self.dtype,
                       interpret=jax.default_backend() != "tpu")
            else:
                f = stage(f, train=train, emit_qtensor=chain_q)
            feats.append(dequantize(f, self.dtype) if chain_q else f)
        return feats


class Decoder(nn.Module):
    """4 shared UpConv stages with skip-concat against the encoder feature
    of matching scale (pwcnet.py:186-206)."""

    filters: Sequence[int] = DECODER_FILTERS
    dtype: Any = jnp.float32
    quant: QuantConfig | None = None
    # Last upconv_stages stages run as the fused Pallas transpose-conv
    # kernel (ops/pallas/upconv_kernel.py) — the trailing stages emit
    # C=32/16 maps that XLA lane-pads, same pathology as the encoder
    # stem. Float path only; train=True uses the exact-VJP wrapper.
    upconv_stages: int = 0

    def setup(self):
        self.stages = [
            UpConv(f, dtype=self.dtype, quant=self.quant,
                   name=f"stage_{i}")
            for i, f in enumerate(self.filters)
        ]

    def __call__(self, encs, train: bool = False):
        f = encs[-1]
        decs = []
        i = -2
        n = len(self.stages)
        for k, stage in enumerate(self.stages):
            if (n - k <= self.upconv_stages
                    and self.quant is None
                    and not self.is_initializing()):
                from qpwcnet_tpu.ops.pallas.upconv_kernel import (
                    upconv_stage_pallas,
                    upconv_stage_trainable,
                )

                p = self.get_variable("params", f"stage_{k}")
                op = (upconv_stage_trainable if train
                      else upconv_stage_pallas)
                f = op(f, p, dtype=self.dtype,
                       interpret=jax.default_backend() != "tpu")
            else:
                f = stage(f, update_stats=train)
            f = jnp.concatenate([f, encs[i].astype(f.dtype)], axis=-1)
            i -= 1
            decs.append(f)
        return decs


class Flower(nn.Module):
    """Multi-level flow stack: FlowBlock at the coarsest scale, then
    num_levels x (2x-upsample(x2.0) + UpFlowBlock), final 2x-upsample(x2.0)
    (pwcnet.py:28-67). Outputs num_levels+2 flows, coarse to fine."""

    num_levels: int = len(DECODER_FILTERS)
    dtype: Any = jnp.float32
    # Either one impl string for every level ('auto'|'xla'|'pallas'|
    # 'fused'), or a TUPLE of num_levels+1 strings: entry 0 is the
    # coarsest FlowBlock, entries 1..num_levels the UpFlowBlocks coarse
    # to fine — per-level dispatch so e.g. only the fine levels (where
    # the fused warp+correlate kernel's measured win lives) run fused
    # while coarse levels keep the exact pair.
    cv_impl: Any = "auto"
    quant: QuantConfig | None = None
    spatial: Any = None
    # Trainable-from-scratch head parameterization (see
    # blocks.OptFlow.head_scale / UpFlowBlock.residual). Defaults are
    # exact reference parity.
    head_scale: str = "diag"
    residual: bool = False

    def _impl_at(self, i: int) -> str:
        if isinstance(self.cv_impl, tuple):
            assert len(self.cv_impl) == self.num_levels + 1, self.cv_impl
            return self.cv_impl[i]
        if self.cv_impl == "fast":
            # Measured per-level dispatch (artifacts/ab_cv_dispatch.py,
            # round 5, 448x1024 b8): the fused warp+correlate kernel
            # wins ONLY at the finest level in-model (57.8 ms vs 70.8
            # exact); fusing the coarser levels too COSTS ~9 ms
            # (fused-everywhere: 66.9 ms) — at coarse levels the
            # kernel's (2w+2)^2 VPU tap work exceeds the small
            # warp+cost-volume HBM round trip it saves.
            return "fused" if i == self.num_levels else "auto"
        return self.cv_impl

    def setup(self):
        self.flow = FlowBlock(dtype=self.dtype, cv_impl=self._impl_at(0),
                              quant=self.quant, spatial=self.spatial,
                              head_scale=self.head_scale,
                              name="flow_0")
        self.upflows = [
            UpFlowBlock(dtype=self.dtype, cv_impl=self._impl_at(i + 1),
                        quant=self.quant, spatial=self.spatial,
                        head_scale=self.head_scale,
                        residual=self.residual,
                        name=f"upflow_{i}")
            for i in range(self.num_levels)
        ]

    def __call__(self, enc_prv, enc_nxt, decs_prv, decs_nxt,
                 train: bool = False):
        flo = self.flow(enc_prv, enc_nxt, train=train)
        flos = [flo]
        for i in range(self.num_levels):
            flo_u = upsample2x_bilinear(flo, scale=2.0)
            flo = self.upflows[i](decs_prv[i], decs_nxt[i], flo_u,
                                  train=train)
            flos.append(flo)
        flos.append(upsample2x_bilinear(flo, scale=2.0))
        return flos


class PWCFlowNet(nn.Module):
    """The optical-flow model ('qpwc_net', pwcnet.py:210-244).

    __call__(inputs (B,H,W,6), train) -> list of 6 multiscale flows at
    1/32..1/1 of input resolution when train=True, else the final flow.
    """

    dtype: Any = jnp.float32
    cv_impl: Any = "auto"  # str, or per-level tuple (see Flower.cv_impl)
    quant: QuantConfig | None = None
    spatial: Any = None
    head_scale: str = "diag"
    residual: bool = False
    # See Encoder.s2d_stages (exact s2d spelling of the stem convs).
    s2d_stages: int = 0
    # See Encoder.stem_stages (fused Pallas stem kernel).
    stem_stages: int = 0
    # See Decoder.upconv_stages (fused Pallas transpose-conv kernel).
    upconv_stages: int = 0
    # Run the siamese encoder/decoder ONCE on the 2B-stacked [prv; nxt]
    # batch instead of twice on B (numerically exact: the encoder and
    # decoder are normalizer-free, pwcnet.py:142-146, so no batch
    # statistics couple the two halves). Halves the op count of the
    # pyramid stages — fewer XLA launches, larger per-op batches.
    fuse_batch: bool = True

    def setup(self):
        self.encoder = Encoder(dtype=self.dtype, quant=self.quant,
                               s2d_stages=self.s2d_stages,
                               stem_stages=self.stem_stages)
        self.decoder = Decoder(dtype=self.dtype, quant=self.quant,
                               upconv_stages=self.upconv_stages)
        self.flower = Flower(dtype=self.dtype, cv_impl=self.cv_impl,
                             quant=self.quant, spatial=self.spatial,
                             head_scale=self.head_scale,
                             residual=self.residual)

    def __call__(self, inputs, train: bool = False):
        img_prv, img_nxt = jnp.split(inputs, 2, axis=-1)
        if self.fuse_batch:
            b = img_prv.shape[0]
            both = jnp.concatenate([img_prv, img_nxt], axis=0)
            encs = self.encoder(both, train=train)
            decs = self.decoder(encs, train=train)
            encs_prv = [e[:b] for e in encs]
            encs_nxt = [e[b:] for e in encs]
            decs_prv = [d[:b] for d in decs]
            decs_nxt = [d[b:] for d in decs]
        else:
            encs_prv = self.encoder(img_prv, train=train)
            encs_nxt = self.encoder(img_nxt, train=train)
            decs_prv = self.decoder(encs_prv, train=train)
            decs_nxt = self.decoder(encs_nxt, train=train)
        flos = self.flower(
            encs_prv[-1], encs_nxt[-1], decs_prv, decs_nxt, train=train
        )
        flos = [f.astype(jnp.float32) for f in flos]
        return flos if train else flos[-1]


class PWCInterpolator(nn.Module):
    """Frame-interpolation model (build_interpolator, pwcnet.py:247-287):
    shared encoder/decoder, ONE shared Flower run in both directions, and
    the interpolator head (pwcnet.py:70-131).

    __call__(inputs (B,H,W,6), train) -> list of 6 multiscale middle-frame
    images img_0..img_5 at 1/32,1/16,1/8,1/4,1/2,1/1 when train=True
    (matching the reference's per-scale loss names img_0_loss..img_5_loss,
    README.md:70), else the final image.
    """

    dtype: Any = jnp.float32
    cv_impl: Any = "auto"  # str, or per-level tuple (see Flower.cv_impl)
    quant: QuantConfig | None = None
    head_scale: str = "diag"
    residual: bool = False
    # See Encoder.s2d_stages (exact s2d spelling of the stem convs).
    s2d_stages: int = 0
    # See Encoder.stem_stages (fused Pallas stem kernel).
    stem_stages: int = 0
    # See Decoder.upconv_stages (fused Pallas transpose-conv kernel).
    upconv_stages: int = 0
    # Batch-fuse the siamese pyramid (exact — no normalizers) AND the
    # two Flower directions into single 2B calls. The shared Flower is
    # the interp step's dominant cost; one 2B pass halves its op/launch
    # count. Direction fusion is exact in eval mode (BatchNorm running
    # stats); in train mode the OptFlow BatchNorms normalize over the
    # joint 2B direction batch instead of per-direction — the same
    # statistics in expectation, since the direction batches are the
    # same image pairs reversed.
    fuse_batch: bool = True

    def setup(self):
        self.encoder = Encoder(dtype=self.dtype, quant=self.quant,
                               s2d_stages=self.s2d_stages,
                               stem_stages=self.stem_stages)
        self.decoder = Decoder(dtype=self.dtype, quant=self.quant,
                               upconv_stages=self.upconv_stages)
        self.flower = Flower(dtype=self.dtype, cv_impl=self.cv_impl,
                             quant=self.quant,
                             head_scale=self.head_scale,
                             residual=self.residual)
        n = len(DECODER_FILTERS)
        self.interp_0 = FrameInterpolate(up=False, dtype=self.dtype,
                                         quant=self.quant, name="img_0")
        self.interps = [
            FrameInterpolate(up=True, dtype=self.dtype,
                             quant=self.quant, name=f"img_{i + 1}")
            for i in range(n)
        ]

    def __call__(self, inputs, train: bool = False,
                 return_flows: bool = False):
        """return_flows=True additionally returns the bidirectional
        multiscale flows (flos_01, flos_10) — the role of the reference's
        flow-submodel extraction by layer name 'lambda_11'
        (pre_train_test.py:102-106), without the name fishing."""
        img_prv, img_nxt = jnp.split(inputs, 2, axis=-1)
        if self.fuse_batch:
            b = img_prv.shape[0]
            both = jnp.concatenate([img_prv, img_nxt], axis=0)
            encs = self.encoder(both, train=train)
            decs = self.decoder(encs, train=train)
            decs_prv = [d[:b] for d in decs]
            decs_nxt = [d[b:] for d in decs]

            # One 2B Flower pass over both directions: rows [:B] compute
            # flos_01 (reference arg order (nxt, prv), pwcnet.py:274-280),
            # rows [B:] compute flos_10 ((prv, nxt)). swap(x) = [nxt; prv]
            # is a batch roll of the [prv; nxt] stack.
            def swap(x):
                return jnp.concatenate([x[b:], x[:b]], axis=0)

            flos = self.flower(swap(encs[-1]), encs[-1],
                               [swap(d) for d in decs], decs, train=train)
            flos_01 = [f[:b] for f in flos]
            flos_10 = [f[b:] for f in flos]
        else:
            encs_prv = self.encoder(img_prv, train=train)
            encs_nxt = self.encoder(img_nxt, train=train)
            decs_prv = self.decoder(encs_prv, train=train)
            decs_nxt = self.decoder(encs_nxt, train=train)

            # Reference argument order preserved (pwcnet.py:274-280).
            flos_01 = self.flower(encs_nxt[-1], encs_prv[-1], decs_nxt,
                                  decs_prv, train=train)
            flos_10 = self.flower(encs_prv[-1], encs_nxt[-1], decs_prv,
                                  decs_nxt, train=train)

        n = len(DECODER_FILTERS)
        # AvgPool image pyramid, n+1 levels deep (pwcnet.py:85-90).
        imgs_prv = [img_prv]
        imgs_nxt = [img_nxt]
        for _ in range(n + 1):
            imgs_prv.append(avg_pool_2x(imgs_prv[-1]))
            imgs_nxt.append(avg_pool_2x(imgs_nxt[-1]))

        img = self.interp_0(imgs_prv[-1], imgs_nxt[-1], flos_01[0],
                            flos_10[0], train=train)
        imgs = [img]
        for i in range(n):
            # NOTE: at up levels the reference feeds DECODER features as
            # prv/nxt (pwcnet.py:120-121); pyramid images beyond the
            # coarsest level are unused. Preserved.
            img_u = upsample2x_bilinear(img, scale=1.0)
            img = self.interps[i](decs_prv[i], decs_nxt[i], flos_01[i + 1],
                                  flos_10[i + 1], img_u, train=train)
            imgs.append(img)
        imgs.append(upsample2x_bilinear(img, scale=1.0))

        imgs = [im.astype(jnp.float32) for im in imgs]
        out = imgs if train else imgs[-1]
        if return_flows:
            return out, (flos_01, flos_10)
        return out


def _init_variables(model, rng, init_hw):
    """Initialize at a small shape: all parameters (conv kernels, BN
    stats) are spatial-shape-independent — the OptFlow sqrt(h²+w²) scale
    is recomputed per call — so initializing at the full input resolution
    would only waste a multi-minute device compile. (64, 128) is the
    smallest comfortable 5-level pyramid.

    The init runs EAGERLY ON CPU and the finished tree is device_put to
    the default backend. Rationale (all three alternatives measured,
    round 4): an eager `model.init` on the remote-tunnel TPU dispatches
    every per-parameter RNG primitive as its own mini-program — ~40
    compiles + round trips = 418 s of process startup per bench/app
    run; jitting the whole init as ONE TPU program instead traces the
    forward too, so the single compile (XLA + 5 Mosaic cost-volume
    kernels) took >580 s on a cache miss — and a jitted init recompiles
    per build_flow_net call anyway (fresh closure each time). Eager CPU
    init is ~19 s in a fresh process (primitive compiles are in-process
    cached after that), needs no tunnel at all, and parameter values
    are backend-independent (threefry RNG is deterministic across
    backends; ulp-level f32 differences in the init transforms are
    irrelevant — checkpoints are the value source of truth)."""
    dummy = jnp.zeros((1, init_hw[0], init_hw[1], 6), jnp.float32)
    # The XLA cost volume for the init trace: Mosaic kernels can't lower
    # for CPU, and the cost volume is parameter-free so the init tree is
    # identical either way. stem_stages likewise shares the exact param
    # tree (the stem kernel READS the QConv params) — normalize it to 0
    # so the init disk cache serves every flag combination from one
    # entry.
    init_kw = {}
    if hasattr(model, "cv_impl"):
        init_kw["cv_impl"] = "xla"
    if hasattr(model, "stem_stages"):
        init_kw["stem_stages"] = 0
    if hasattr(model, "upconv_stages"):
        init_kw["upconv_stages"] = 0
    init_model = model.clone(**init_kw) if init_kw else model
    variables = _cached_init(init_model, rng, dummy)
    if jax.default_backend() != "cpu":
        # local_devices, not devices: in multi-host runs (parallel/
        # multihost.py) jax.devices() is the GLOBAL list, and on
        # process_index>0 entry [0] is not addressable — device_put
        # would raise at startup (ADVICE r4).
        variables = jax.device_put(variables, jax.local_devices()[0])
    return variables


def _cached_init(init_model, rng, dummy):
    """Eager CPU init with a DISK cache of the finished tree.

    The eager init costs ~20-70 s of per-process CPU (this host's
    XLA:CPU AOT cache never serves — machine-feature mismatch — so every
    primitive recompiles each process). The tree is a deterministic
    function of (module config, rng, dummy shape): cache it under a key
    of exactly those, so every bench/app/test process after the first
    skips the init entirely. Delete $QPWCNET_TPU_INIT_CACHE (default
    ~/.cache/qpwcnet_tpu_init) to invalidate, e.g. after changing an
    init scheme; the key includes the module repr, which covers params-
    affecting config (filters, quant mode, head init flags...)."""
    import hashlib
    import os
    import pickle

    cache_dir = os.environ.get(
        "QPWCNET_TPU_INIT_CACHE",
        os.path.expanduser("~/.cache/qpwcnet_tpu_init"))
    try:
        rng_bits = jax.random.key_data(rng)  # new-style typed key
    except TypeError:
        rng_bits = rng                       # legacy raw uint32 key
    import numpy as np
    key_src = repr((
        type(init_model).__name__,
        init_model,          # flax modules repr their full config
        np.asarray(rng_bits).tolist(),
        dummy.shape,
    )).encode()
    key = hashlib.sha256(key_src).hexdigest()[:24]
    path = os.path.join(cache_dir, f"{key}.pkl")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                return pickle.load(f)
        except Exception:
            pass  # corrupt cache entry: fall through and rewrite

    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        variables = init_model.init(
            jax.device_put(rng, cpu), jax.device_put(dummy, cpu),
            train=False)
    variables = jax.device_get(variables)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(variables, f)
        os.replace(tmp, path)
    except Exception:
        pass  # caching is best-effort
    return variables


def build_flow_net(
    rng: jax.Array,
    input_hw: tuple[int, int] = (256, 512),
    dtype: Any = jnp.float32,
    cv_impl: Any = "auto",
    init_hw: tuple[int, int] = (64, 128),
    quant: QuantConfig | None = None,
    spatial: Any = None,
    head_scale: str = "diag",
    residual: bool = False,
    fuse_batch: bool = True,
    s2d_stages: int = 0,
    stem_stages: int = 0,
    upconv_stages: int = 0,
):
    """Construct a PWCFlowNet and initialize its variables.

    `input_hw` documents the intended apply resolution (any multiple of
    32 works — params are shape-independent, see _init_variables).
    `spatial`: a parallel.spatial_ops.SpatialConfig for the H-sharded
    fast path (halo-exchanged Pallas cost volume + window warp). The
    variables are initialized WITHOUT it (single device init) — params
    are identical either way.
    `head_scale`/`residual`: trainable-from-scratch head
    parameterization (blocks.OptFlow/UpFlowBlock); defaults are exact
    reference parity, and param shapes are IDENTICAL in every mode so
    checkpoints transfer between modes.
    Returns (module, variables) where variables = {'params', 'batch_stats'}.
    """
    del input_hw
    if (stem_stages or upconv_stages) and (
            quant is not None or spatial is not None):
        raise ValueError(
            "stem_stages requires the float path (no quant) and no "
            "spatial sharding — the fused stem kernel is not "
            "shard_map-aware and the int8 chain keeps its own conv")
    kw = dict(dtype=dtype, cv_impl=cv_impl, quant=quant,
              head_scale=head_scale, residual=residual,
              fuse_batch=fuse_batch, s2d_stages=s2d_stages,
              stem_stages=stem_stages, upconv_stages=upconv_stages)
    init_model = PWCFlowNet(**kw)
    variables = _init_variables(init_model, rng, init_hw)
    model = (init_model if spatial is None else
             PWCFlowNet(spatial=spatial, **kw))
    return model, variables


def build_interpolator(
    rng: jax.Array,
    input_hw: tuple[int, int] = (256, 512),
    dtype: Any = jnp.float32,
    cv_impl: Any = "auto",
    init_hw: tuple[int, int] = (64, 128),
    quant: QuantConfig | None = None,
    head_scale: str = "diag",
    residual: bool = False,
    fuse_batch: bool = True,
    stem_stages: int = 0,
):
    """Construct a PWCInterpolator and initialize its variables."""
    del input_hw
    if stem_stages and quant is not None:
        raise ValueError("stem_stages requires the float path")
    model = PWCInterpolator(dtype=dtype, cv_impl=cv_impl, quant=quant,
                            head_scale=head_scale, residual=residual,
                            fuse_batch=fuse_batch,
                            stem_stages=stem_stages)
    return model, _init_variables(model, rng, init_hw)
