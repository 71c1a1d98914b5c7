"""Dump the encoder-only optimized HLO with layouts and rank the
instructions by output bytes INCLUDING layout padding (round 5).

hlo_bytes.py ranks by logical shape bytes; relayout waste hides in the
LAYOUT (lane-padded minor dims). This parses the {minor-to-major:T(...)}
annotations and computes padded sizes, so spatial-minor vs channel-minor
decisions and their copy costs become visible per instruction.

Run: PYTHONPATH=/root/.axon_site:/root/repo python artifacts/enc_hlo.py
Env: ENC_S2D (default 0), PROF_HW, PROF_BATCH.
"""

import os
import re
import sys

import numpy as np

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DT = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
      "pred": 1, "f16": 2, "s16": 2, "u16": 2, "s64": 8, "u64": 8}

# f32[8,224,512,16]{3,2,1,0:T(8,128)} or {2,1,3,0:T(8,128)(2,1)} etc.
FULL_RE = re.compile(
    r"\b(f32|bf16|s32|u32|s8|u8|pred|f16|s16|u16)\[([0-9,]*)\]"
    r"(?:\{([0-9,]+)(?::T\(([0-9,x]+)\))?[^}]*\})?")


def padded_bytes(m):
    dt, dims_s, m2m_s, tile_s = m.groups()
    dims = [int(d) for d in dims_s.split(",") if d]
    if not dims:
        return DT[dt], DT[dt]
    logical = int(np.prod(dims)) * DT[dt]
    if not m2m_s:
        return logical, logical
    m2m = [int(d) for d in m2m_s.split(",")]
    # tile like "8,128" applies to the two minormost dims
    phys = [dims[i] for i in m2m[::-1]]  # major..minor -> sizes
    if tile_s:
        tdims = [int(t) for t in tile_s.replace("x", ",").split(",")]
        k = len(tdims)
        for j in range(1, k + 1):
            if j <= len(phys):
                t = tdims[-j]
                phys[-j] = (phys[-j] + t - 1) // t * t
    padded = int(np.prod(phys)) * DT[dt]
    return logical, padded


def main():
    sys.path.insert(0, "/root/repo")
    from qpwcnet_tpu.models import build_flow_net
    from qpwcnet_tpu.models.pwcnet import Encoder
    from qpwcnet_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    hw = tuple(int(v) for v in os.environ.get(
        "PROF_HW", "448,1024").split(","))
    batch = int(os.environ.get("PROF_BATCH", "8"))
    s2d = int(os.environ.get("ENC_S2D", "0"))
    dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

    model, variables = build_flow_net(jax.random.key(0), hw, dtype=dtype)
    enc = Encoder(dtype=dtype, s2d_stages=s2d)
    ev = {"params": variables["params"]["encoder"]}
    rng = np.random.RandomState(0)
    xe = jnp.asarray(rng.uniform(
        -0.5, 0.5, (2 * batch, hw[0], hw[1], 3)).astype(np.float32))

    fn = jax.jit(lambda v, x: enc.apply(v, x, train=False)[-1])
    compiled = fn.lower(ev, xe).compile()
    txt = compiled.as_text()
    path = f"/tmp/enc_hlo_s2d{s2d}.txt"
    with open(path, "w") as f:
        f.write(txt)
    log(f"HLO -> {path} ({len(txt)/1e6:.1f} MB)")
    ca = compiled.cost_analysis()
    log(f"bytes accessed (XLA): {float(ca['bytes accessed'])/1e9:.2f} GB")

    m = re.search(r"^ENTRY [^{]+\{(.*?)^\}", txt, re.M | re.S)
    entry = m.group(1)
    rows = []
    tot_log = tot_pad = 0
    for im in re.finditer(
            r"^\s+(?:ROOT\s+)?%?[\w.\-]+ = ([^=]+?) ([a-z\-]+)\(",
            entry, re.M):
        rtype, op = im.groups()
        lg = pd = 0
        for sm in FULL_RE.finditer(rtype):
            l, p = padded_bytes(sm)
            lg += l
            pd += p
        tot_log += lg
        tot_pad += pd
        if pd > 20e6:
            line = entry[im.start():im.start() + 300]
            line = line.strip().split("\n")[0]
            rows.append((pd, lg, op, line[:260]))
    log(f"\nENTRY totals: logical {tot_log/1e9:.2f} GB, "
        f"layout-padded {tot_pad/1e9:.2f} GB")
    log("\n=== ENTRY instructions by PADDED output bytes (>20MB) ===")
    for pd, lg, op, line in sorted(rows, reverse=True)[:30]:
        log(f"{pd/1e6:9.1f} MB (logical {lg/1e6:8.1f})  {line}")


if __name__ == "__main__":
    main()
