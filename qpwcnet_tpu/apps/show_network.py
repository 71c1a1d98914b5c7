"""Model inspection app (parity with qpwcnet/app/util/show_network.py:
summary + graph/profile traces): parameter-count tree, XLA cost analysis
(FLOPs / bytes), and an optional XProf device trace.

Run: python -m qpwcnet_tpu.apps.show_network --model flow --height 256
"""

from __future__ import annotations

import dataclasses
import sys

import jax
import jax.numpy as jnp

from qpwcnet_tpu.utils.config import with_args


@dataclasses.dataclass
class Settings:
    model: str = "flow"       # 'flow' | 'interp'
    height: int = 256
    width: int = 512
    trace_dir: str = ""       # write an XProf trace here if set
    compute_dtype: str = "float32"


@with_args(Settings)
def main(cfg: Settings):
    from qpwcnet_tpu.models import build_flow_net, build_interpolator
    from qpwcnet_tpu.utils.profiling import (
        cost_analysis, summarize_model, time_fn, trace)

    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    build = build_flow_net if cfg.model == "flow" else build_interpolator
    model, variables = build(
        jax.random.key(0), (cfg.height, cfg.width), dtype=dtype)

    print(summarize_model(variables["params"]))

    def forward(ims):
        return model.apply(variables, ims, train=False)

    ims = jnp.zeros((1, cfg.height, cfg.width, 6), jnp.float32)
    analysis = cost_analysis(forward, ims)
    flops = analysis.get("flops", 0)
    print(f"\nXLA cost analysis: {flops / 1e9:.2f} GFLOP/forward, "
          f"{analysis.get('bytes accessed', 0) / 1e6:.1f} MB accessed")

    dt = time_fn(jax.jit(forward), ims, iters=10)
    print(f"forward: {dt * 1e3:.2f} ms "
          f"({flops / dt / 1e12:.2f} TFLOP/s achieved)")

    if cfg.trace_dir:
        with trace(cfg.trace_dir):
            jax.block_until_ready(jax.jit(forward)(ims))
        print(f"trace written to {cfg.trace_dir}", file=sys.stderr)


if __name__ == "__main__":
    main()
