"""Attribute the headline forward's bytes to HLO ops (round 4, task 7).

The stage profile shows the encoder alone accessing 8.7 GB — far more
than its logical tensors. XLA:TPU picks spatial-minor layouts for
low-channel convs (observed: bf16[8,81,240,512]{3,2,1,0:T(8,128)})
and inserts relayout copies between ops that disagree; this script
compiles the forward, parses the optimized HLO, and sums output bytes
by op kind (fusion/copy/transpose/convolution/...) to find where the
gigabytes actually go.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/hlo_bytes.py
"""

import collections
import os
import re
import sys

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
               "pred": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8}

SHAPE_RE = re.compile(r"\b(f32|bf16|s32|u32|s8|u8|pred|f16|s16|u16|s64|u64)"
                      r"\[([0-9,]*)\]")


def shape_bytes(text):
    """Sum byte sizes of all shapes in an HLO result-type string."""
    total = 0
    for m in SHAPE_RE.finditer(text):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main():
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    hw = tuple(int(v) for v in os.environ.get(
        "PROF_HW", "448,1024").split(","))
    batch = int(os.environ.get("PROF_BATCH", "8"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.uniform(
        -0.5, 0.5, (batch, hw[0], hw[1], 6)).astype(np.float32))

    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    compiled = fwd.lower(variables, x0).compile()
    txt = compiled.as_text()
    log(f"HLO text: {len(txt) / 1e6:.1f} MB")
    with open("/tmp/fwd_hlo.txt", "w") as f:
        f.write(txt)

    # ENTRY-only tally: ops inside %fused_computation bodies are fused
    # (free); only ENTRY instructions are executed kernels.
    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.M | re.S)
    if m:
        entry = m.group(1)
        ekind = collections.Counter()
        for im in re.finditer(
                r"^\s+(?:ROOT\s+)?%?[\w.\-]+ = ([^ ]+) ([a-z\-]+)\(",
                entry, re.M):
            rtype, op = im.groups()
            ekind[op] += shape_bytes(rtype)
        log("\n=== ENTRY-only output bytes by op kind (GB) ===")
        for op, b in ekind.most_common(15):
            log(f"{op:24s} {b / 1e9:8.2f}")
        big = []
        for im in re.finditer(
                r"^\s+(?:ROOT\s+)?%?[\w.\-]+ = ([^ ]+) ([a-z\-]+)\(",
                entry, re.M):
            b = shape_bytes(im.group(1))
            if b > 50e6:
                line = entry[im.start():im.start() + 220]
                big.append((b, line.strip().split("\n")[0][:200]))
        log("\n=== ENTRY instructions with >50 MB output ===")
        for b, line in sorted(big, reverse=True)[:40]:
            log(f"{b / 1e6:9.1f} MB  {line}")

    # Per-instruction: "  %name = TYPE op(...)" — attribute the OUTPUT
    # bytes of each top-level instruction in the entry computation, and
    # for fusions also bucket by fusion kind.
    by_kind = collections.Counter()
    biggest = []
    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?[\w.\-]+ = ([^ ]+) ([a-z\-]+)\(", re.M)
    for m in inst_re.finditer(txt):
        rtype, op = m.groups()
        b = shape_bytes(rtype)
        by_kind[op] += b
        if b > 50e6:
            line = txt[m.start():m.start() + 160].strip().split("\n")[0]
            biggest.append((b, op, line[:150]))

    log("\n=== output bytes by op kind (GB) ===")
    for op, b in by_kind.most_common(15):
        log(f"{op:24s} {b / 1e9:8.2f}")

    log("\n=== instructions with >50 MB output ===")
    for b, op, line in sorted(biggest, reverse=True)[:40]:
        log(f"{b / 1e6:9.1f} MB  {line}")

    # copy/transpose/bitcast-convert tally including inside fusions
    for kind in ("copy(", "transpose(", "reshape("):
        n = txt.count(" " + kind)
        log(f"total '{kind[:-1]}' instructions (incl. fused): {n}")


if __name__ == "__main__":
    main()
