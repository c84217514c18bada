"""Optimizer construction.

Reference semantics (RenderNet_Shader.py:166-167):
``tf.train.exponential_decay(e_eta, step, decay_steps, 0.96, staircase=True)``
into ``AdamOptimizer(beta1=0.5)`` (TF defaults beta2=0.999, eps=1e-8).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax

__all__ = [
    "exponential_staircase",
    "make_optimizer",
    "reject_nonfinite",
    "RejectNonFiniteState",
]


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


class RejectNonFiniteState(NamedTuple):
    notfinite_count: jnp.ndarray  # consecutive rejected updates
    total_notfinite: jnp.ndarray
    inner_state: optax.OptState


def reject_nonfinite(
    inner: optax.GradientTransformation,
) -> optax.GradientTransformation:
    """Reject updates whose gradients contain NaN/Inf — ALWAYS.

    Unlike ``optax.apply_if_finite``, this never "gives up and accepts" a
    non-finite update, so parameters and inner optimizer state cannot be
    poisoned no matter how long the failure persists; the training loop
    reads ``notfinite_count`` (consecutive) from the state to decide when
    to halt (failure detection — the reference has none, SURVEY.md §5).
    """

    def init(params):
        return RejectNonFiniteState(
            notfinite_count=jnp.zeros([], jnp.int32),
            total_notfinite=jnp.zeros([], jnp.int32),
            inner_state=inner.init(params),
        )

    def update(updates, state, params=None):
        leaves = jax.tree.flatten(updates)[0]
        isfinite = jnp.all(
            jnp.array([jnp.all(jnp.isfinite(u)) for u in leaves])
        )

        def do_update(_):
            return inner.update(updates, state.inner_state, params)

        def reject(_):
            return jax.tree.map(jnp.zeros_like, updates), state.inner_state

        new_updates, new_inner = lax.cond(isfinite, do_update, reject, None)
        return new_updates, RejectNonFiniteState(
            notfinite_count=jnp.where(isfinite, 0, state.notfinite_count + 1),
            total_notfinite=state.total_notfinite
            + jnp.where(isfinite, 0, 1).astype(jnp.int32),
            inner_state=new_inner,
        )

    return optax.GradientTransformation(init, update)


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
    with NaN/Inf gradients on-device (see :func:`reject_nonfinite` — the
    count is a halt threshold read by the train loop, and rejection never
    expires into acceptance)."""
    tx = optax.adam(
        learning_rate=exponential_staircase(e_eta, decay_steps, decay_rate),
        b1=b1,
        b2=b2,
        eps=eps,
    )
    if skip_nonfinite > 0:
        tx = reject_nonfinite(tx)
    return tx
