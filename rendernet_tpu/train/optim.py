"""Optimizer construction.

Reference semantics (RenderNet_Shader.py:166-167):
``tf.train.exponential_decay(e_eta, step, decay_steps, 0.96, staircase=True)``
into ``AdamOptimizer(beta1=0.5)`` (TF defaults beta2=0.999, eps=1e-8).
"""
from __future__ import annotations

import optax

__all__ = ["exponential_staircase", "make_optimizer"]


def exponential_staircase(
    init_value: float, decay_steps: int, decay_rate: float = 0.96
) -> optax.Schedule:
    """lr(step) = init * rate^floor(step / decay_steps)."""
    return optax.exponential_decay(
        init_value=init_value,
        transition_steps=decay_steps,
        decay_rate=decay_rate,
        staircase=True,
    )


def make_optimizer(
    e_eta: float,
    decay_steps: int,
    decay_rate: float = 0.96,
    b1: float = 0.5,
    b2: float = 0.999,
    eps: float = 1e-8,
    skip_nonfinite: int = 0,
) -> optax.GradientTransformation:
    """Reference Adam; ``skip_nonfinite > 0`` additionally rejects updates
    with NaN/Inf gradients on-device for up to that many consecutive steps
    (failure recovery — the reference has none, SURVEY.md §5)."""
    tx = optax.adam(
        learning_rate=exponential_staircase(e_eta, decay_steps, decay_rate),
        b1=b1,
        b2=b2,
        eps=eps,
    )
    if skip_nonfinite > 0:
        tx = optax.apply_if_finite(tx, max_consecutive_errors=skip_nonfinite)
    return tx
