"""Optimizer & LR schedule (reference ``train_stereo.py:185-192``).

AdamW (wdecay 1e-5, eps 1e-8) + linear OneCycle (pct_start 0.01,
torch defaults div_factor=25, final_div_factor=1e4, total steps num_steps+100)
with global-norm gradient clipping at 1.0 (reference :415), expressed as an
optax chain.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from tcs_tpu.config import TrainConfig


def onecycle_linear_schedule(peak_lr: float, total_steps: int,
                             pct_start: float = 0.01,
                             div_factor: float = 25.0,
                             final_div_factor: float = 1e4):
    """torch ``OneCycleLR(anneal_strategy='linear', three_phase=False)``."""
    initial = peak_lr / div_factor
    final = initial / final_div_factor
    warm = max(int(pct_start * total_steps), 1)

    def schedule(step):
        s = jnp.minimum(step, total_steps).astype(jnp.float32)
        up = initial + (peak_lr - initial) * (s / warm)
        down = peak_lr + (final - peak_lr) * ((s - warm) / max(total_steps - warm, 1))
        return jnp.where(s < warm, up, down)

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    schedule = onecycle_linear_schedule(cfg.lr, cfg.num_steps + 100)
    return optax.chain(
        optax.clip_by_global_norm(cfg.grad_clip),
        optax.adamw(
            learning_rate=schedule,
            b1=0.9,
            b2=0.999,
            eps=1e-8,
            weight_decay=cfg.wdecay,
        ),
    )
