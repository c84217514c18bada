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
    "scale_by_adam_moments",
    "AdamMomentState",
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


class AdamMomentState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def scale_by_adam_moments(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    moment_dtype=None,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` semantics with BOTH moment buffers stored in
    ``moment_dtype`` (e.g. bf16 — halves optimizer-state HBM: ~0.95 GB at
    the shader net's 237 M params). The moment *update arithmetic* and the
    bias-corrected step are computed in fp32 (moments are loaded, updated,
    then stored back rounded), so the only deviation from fp32 Adam is the
    storage rounding of mu/nu. ``moment_dtype=None`` stores in the param
    dtype — then this is exactly optax's update rule."""

    def cast(t):
        return t if moment_dtype is None else jax.tree.map(
            lambda x: x.astype(moment_dtype), t
        )

    def init(params):
        zeros = lambda p: jnp.zeros(
            jnp.shape(p), jnp.result_type(p) if moment_dtype is None
            else moment_dtype
        )
        return AdamMomentState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)

        def upd(g, mu, nu):
            g32 = g.astype(jnp.float32)
            mu32 = b1 * mu.astype(jnp.float32) + (1 - b1) * g32
            nu32 = b2 * nu.astype(jnp.float32) + (1 - b2) * g32 * g32
            mu_hat = mu32 / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu32 / (1 - b2 ** count.astype(jnp.float32))
            step = mu_hat / (jnp.sqrt(nu_hat) + eps)
            return step.astype(g.dtype), mu32, nu32

        g_flat, treedef = jax.tree.flatten(updates)
        out = [
            upd(g, mu, nu)
            for g, mu, nu in zip(
                g_flat, jax.tree.leaves(state.mu), jax.tree.leaves(state.nu)
            )
        ]
        steps = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return steps, AdamMomentState(count=count, mu=cast(mu), nu=cast(nu))

    return optax.GradientTransformation(init, update)


def make_optimizer(
    e_eta: float,
    decay_steps: int,
    decay_rate: float = 0.96,
    b1: float = 0.5,
    b2: float = 0.999,
    eps: float = 1e-8,
    skip_nonfinite: int = 0,
    moment_dtype: str = "float32",
) -> optax.GradientTransformation:
    """Reference Adam; ``skip_nonfinite > 0`` additionally rejects updates
    with NaN/Inf gradients on-device (see :func:`reject_nonfinite` — the
    count is a halt threshold read by the train loop, and rejection never
    expires into acceptance). ``moment_dtype="bfloat16"`` stores the Adam
    moment buffers in bf16 (see :func:`scale_by_adam_moments`) — an opt-in
    memory lever gated by the training-quality A/B in
    benchmarks/moments_quality_ab.py."""
    schedule = exponential_staircase(e_eta, decay_steps, decay_rate)
    if moment_dtype == "float32":
        tx = optax.adam(learning_rate=schedule, b1=b1, b2=b2, eps=eps)
    else:
        tx = optax.chain(
            scale_by_adam_moments(
                b1=b1, b2=b2, eps=eps,
                moment_dtype={"bfloat16": jnp.bfloat16}[moment_dtype],
            ),
            optax.scale_by_learning_rate(schedule),
        )
    if skip_nonfinite > 0:
        tx = reject_nonfinite(tx)
    return tx
