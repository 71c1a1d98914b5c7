"""Learning-rate schedules (port of app/optical_flow/train.py:29-51).

Both schedules existed in the reference but were bypassed for a constant
1e-4 (train.py:351-354); provided for capability parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def piecewise_halving_schedule(batch_size: int,
                               base_lr: float = 1e-4) -> optax.Schedule:
    """PiecewiseConstantDecay halvings at 400k/600k/800k/1000k samples
    (x8), adjusted by batch size (train.py:29-40)."""
    boundaries = [int(x * 8 / batch_size)
                  for x in (400_000, 600_000, 800_000, 1_000_000)]
    return optax.piecewise_constant_schedule(
        init_value=base_lr,
        boundaries_and_scales={b: 0.5 for b in boundaries},
    )


def triangular2_cyclic_schedule(
    batch_size: int,
    initial_learning_rate: float = 1e-4,
    maximal_learning_rate: float = 5e-3,
    step_size: float | None = None,
) -> optax.Schedule:
    """Triangular2 cyclical LR (tfa.optimizers
    .Triangular2CyclicalLearningRate, train.py:43-51): triangle wave
    between initial and max, amplitude halved each full cycle."""
    if step_size is None:
        step_size = 10e3 * (8 / batch_size)

    def schedule(count):
        cycle = jnp.floor(1 + count / (2 * step_size))
        x = jnp.abs(count / step_size - 2 * cycle + 1)
        amp = (maximal_learning_rate - initial_learning_rate) / (
            2.0 ** (cycle - 1)
        )
        return initial_learning_rate + amp * jnp.maximum(0.0, 1 - x)

    return schedule
