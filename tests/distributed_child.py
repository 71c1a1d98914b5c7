"""Child process for the true 2-process distributed test
(tests/test_multiprocess.py). Run as:

    python tests/distributed_child.py <rank> <port>

Exercises the REAL multi-host path end-to-end on the CPU backend:
jax.distributed.initialize via parallel.multihost.initialize_distributed,
a global mesh spanning both processes (2 local devices each -> 4 global),
disjoint PrefetchLoader shards, make_global_batch assembly, and
make_parallel_step SPMD training. Prints one RESULT line the parent
asserts on: final params (must be identical across ranks — the gradient
all-reduce spans processes) and the set of sample ids this rank loaded
(must be disjoint and complete across ranks).
"""

import json
import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qpwcnet_tpu.parallel.multihost import (  # noqa: E402
    initialize_distributed, is_primary)
from qpwcnet_tpu.parallel import (  # noqa: E402
    make_mesh, make_parallel_step, put_batch, replicate)
from qpwcnet_tpu.data.pipeline import PrefetchLoader  # noqa: E402
from qpwcnet_tpu.train.train_state import (  # noqa: E402
    TrainState, default_optimizer)

initialize_distributed(f"localhost:{port}", num_processes=2,
                       process_id=rank)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()
assert is_primary() == (rank == 0)

N, BS_LOCAL, DIM = 16, 2, 8


def sample(i):
    rng = np.random.RandomState(i)
    return (rng.standard_normal(DIM).astype(np.float32),
            np.float32(i))


loader = PrefetchLoader(sample, N, BS_LOCAL, shuffle=True, seed=7,
                        n_workers=2, shard_index=rank, shard_count=2)

params = {"w": jnp.zeros((DIM,), jnp.float32)}
tx = default_optimizer(1e-2)
state = TrainState(
    step=jnp.zeros((), jnp.int32), params=params, batch_stats={},
    opt_state=tx.init(params), apply_fn=None, tx=tx)


def step_fn(state, batch):
    def loss_fn(p):
        pred = batch["x"] @ p["w"]
        return jnp.mean((pred - batch["y"]) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    state = state.apply_gradients(grads)
    return state, {"loss": loss}


mesh = make_mesh()  # all 4 GLOBAL devices on the data axis
state = replicate(state, mesh)
pstep = make_parallel_step(step_fn, mesh)

it = iter(loader)
seen = []
for _ in range(4):
    x, y = next(it)
    seen.extend(int(v) for v in y)
    batch = put_batch({"x": x, "y": y}, mesh)  # -> make_global_batch
    state, metrics = pstep(state, batch)
loader.close()

w = np.asarray(jax.device_get(state.params["w"])).round(6).tolist()
print("RESULT " + json.dumps(
    {"rank": rank, "w": w, "seen": sorted(seen),
     "loss": float(metrics["loss"])}), flush=True)
