"""VERDICT r3 #8 check: a FINAL checkpoint (saved with recalibrated,
deployment-ready BN stats) must score sanely in eval mode WITHOUT any
eval-side recalibration. Loads the round-4 transfer run's final ckpt and
scores heldout synthetic batches with stored batch_stats only."""
import numpy as np
import jax, jax.numpy as jnp

from qpwcnet_tpu.models import build_flow_net
from qpwcnet_tpu.train.checkpoint import CheckpointManager
from qpwcnet_tpu.train.train_state import create_flow_train_state
from qpwcnet_tpu.data.synthetic import synthetic_flow_batch
from qpwcnet_tpu.train.losses import epe_error

CKPT = "/tmp/qpwcnet_tpu/flow_transfer/000/ckpt"

model, variables = build_flow_net(
    jax.random.PRNGKey(0), (256, 512), dtype=jnp.bfloat16,
    head_scale="diag", residual=False)
state = create_flow_train_state(model, variables)
state = CheckpointManager(CKPT).restore_params(state)
print("restored step:", int(state.step))
assert int(state.step) > 0, "no checkpoint restored"
variables = {"params": state.params, "batch_stats": state.batch_stats}

fused = model.clone(cv_impl="fused")
fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
fwd_fused = jax.jit(lambda v, x: fused.apply(v, x, train=False))
epes, fepes, zeros = [], [], []
for i in range(4):
    key = jax.random.fold_in(jax.random.PRNGKey(1234), 10_000 + i)
    ims_u8, flo = synthetic_flow_batch(key, 8, 256, 512, max_disp=24)
    ims = ims_u8.astype(jnp.float32) / 255.0 - 0.5
    pred = fwd(variables, ims)
    epes.append(float(epe_error(flo, pred)))
    fepes.append(float(epe_error(flo, fwd_fused(variables, ims))))
    zeros.append(float(epe_error(flo, jnp.zeros_like(pred))))
print(f"eval EPE (stored stats, recalibrate 0): {np.mean(epes):.3f} "
      f"(zero-flow baseline {np.mean(zeros):.3f})")
print(f"eval EPE cv_impl='fused' (window-clamped): {np.mean(fepes):.3f} "
      f"(delta {np.mean(fepes) - np.mean(epes):+.3f})")
assert np.mean(epes) < 0.5 * np.mean(zeros), "stored stats are stale!"
print("FRESH-STATS EVAL OK")
