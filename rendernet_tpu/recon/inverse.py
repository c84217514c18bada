"""Gradient-based inverse rendering: recover (shape z, pose, texture, light).

Capability-parity target: ``Reconstruct_RenderNet_Face.py`` —
  * frozen pretrained decoders + renderer, trainable LATENTS only
    (:346-354);
  * forward: decode shape+texture -> rotate both -> concat -> 2-head
    renderer -> albedo * PhongComposite(normal, light) (:356-378);
  * per-sample MSE loss (:383), per-group SGD with 4 learning rates
    (:397-412);
  * coarse-to-fine outer loop over 5 pose hypotheses with range halving
    (:304-318, :458-473), 200 inner gradient steps per epoch (:476-493),
    best-of-batch selection (:522-537).

TPU re-design: the whole pipeline is ONE differentiable jitted function;
the 5 hypotheses ride the batch axis (vmap-free — everything is
batch-native); the inner 200 steps run as a ``lax.scan`` inside a single
device launch, so the per-step Python/Session round-trip of the reference
disappears entirely.
"""
from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rendernet_tpu.models.decoders import (
    recon_rendernet,
    recon_texture_decoder,
    shape_decoder_3d,
)
from rendernet_tpu.nn.layers import Module, Params
from rendernet_tpu.ops.pallas_resample import rotate_resample_to_camera_multipass
from rendernet_tpu.ops.phong import generate_light_pos, phong_composite
from rendernet_tpu.ops.resample import rotate_resample_to_camera

__all__ = [
    "ReconConfig",
    "Latents",
    "ReconModel",
    "recon_forward",
    "recon_per_sample_loss",
    "make_recon_step",
    "create_param_center",
    "initial_latents",
    "subdivided_latents",
    "reconstruct",
]


@dataclasses.dataclass(frozen=True)
class ReconConfig:
    z_dim: int = 200
    texture_dim: int = 199
    batch_size: int = 5  # pose hypotheses
    inner_steps: int = 200
    max_epochs: int = 10
    shape_eta: float = 0.8
    pose_eta: float = 0.01
    tex_eta: float = 0.8
    light_eta: float = 0.4
    light_elevation: float = 0.0  # radians; (90 - target_elev_deg) * pi/180
    ambient: float = 0.0
    k_diffuse: float = 1.0
    new_size: int = 128
    # "auto": fast multipass Pallas warp on TPU, exact trilinear elsewhere.
    resample: str = "auto"
    # Network compute dtype: "bfloat16" runs the frozen conv stacks on the
    # MXU at full rate (latent updates and the loss stay fp32).
    compute_dtype: str = "float32"
    # Initial coarse-to-fine pose search ranges, degrees (:455-456).
    phi_range0: float = 60.0
    theta_range0: float = 30.0
    phi_mid0: float = 270.0
    theta_mid0: float = 90.0
    # Hypothesis-grid shape: "cross" (axis-decoupled — the default; fixes
    # the measured elevation-stall of the reference's grid) or "corners"
    # (the reference's exact 5-point X, Reconstruct_RenderNet_Face.py:
    # 304-318). See create_param_center.
    grid_shape: str = "cross"
    # Extra multiplier on the ELEVATION component of the pose gradient.
    # Measured on the trained mid net (reconstruct_trained.py r3 notes):
    # the elevation gradient is ~20x weaker than azimuth's because
    # adapted texture/light compensate small elevation errors — one
    # shared pose_eta leaves elevation walking far slower than the
    # coarse-to-fine box shrinks. 1.0 = reference semantics.
    el_eta_scale: float = 1.0
    # Range-halving policy: "always" (reference, :458-473 — halve every
    # epoch) or "on_center" (pattern search: halve only when the CENTER
    # hypothesis won the epoch; while an off-center arm keeps winning,
    # the box moves instead of shrinking, so a wrong early center cannot
    # strand the search outside its own reachable set).
    halve_mode: str = "always"
    # Sequence the box search's axes (needs halve_mode="on_center"):
    # start with theta_range = 0 — all five hypotheses differ only in
    # azimuth — and OPEN the theta box (at theta_range0) the first time
    # the center wins, i.e. once azimuth is resolved. Why: azimuth
    # recovers by arm selection, and before it does, the elevation
    # ranking is pure noise (benchmarks/recon_arm_diag.py) — with
    # lockstep halving the theta box is spent by then (the r4 stall at
    # el 9.4°), and with plain on_center the el center RANDOM-WALKS at
    # +-theta_range/2 per epoch on that noise (measured: el err 34° by
    # epoch 3, inverse_render_refscale_trained_r5 attempts). Sequencing
    # gives each axis its full budget exactly when its signal is live.
    sequence_axes: bool = False
    # Epochs during which texture and light etas are ZEROED, so every
    # hypothesis renders with the same (shared-init) texture and light
    # and the best-of-batch ranking reflects POSE alone. Measured
    # motivation (refscale r5 attempts): once texture adapts
    # per-hypothesis, it paints over few-degree elevation error and the
    # elevation ranking (and even its gradient direction) becomes
    # noise/bias — el stalls at ~9 deg or diverges when force-fed.
    # 0 = reference semantics (everything trains from step 0).
    warmup_freeze_epochs: int = 0


class Latents(NamedTuple):
    """The trainable inverse-rendering variables (one row per hypothesis)."""

    vector: jnp.ndarray  # [B, z_dim]
    pose: jnp.ndarray  # [B, 3] (azimuth, elevation, scale) radians
    texture: jnp.ndarray  # [B, texture_dim]
    light: jnp.ndarray  # [B, 1] light azimuth, radians


class ReconModel(NamedTuple):
    """Frozen parameter sets of the three pretrained networks."""

    decoder: Params  # shape decoder (z -> 64^3 voxels)
    texture: Params  # texture decoder
    renderer: Params  # two-head RenderNet


def recon_forward(
    model: ReconModel, latents: Latents, cfg: ReconConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full differentiable pipeline -> (composite, albedo, normal, shape)."""
    b = latents.vector.shape[0]
    cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    md = Module(params=model.decoder, compute_dtype=cdt)
    shape = shape_decoder_3d(md, latents.vector.astype(cdt))
    mt = Module(params=model.texture, compute_dtype=cdt)
    tex = recon_texture_decoder(mt, latents.texture.astype(cdt))

    light_dir = generate_light_pos(latents.light, cfg.light_elevation, b)

    method = cfg.resample
    if method == "auto":
        method = "multipass" if jax.default_backend() == "tpu" else "exact"
    if method == "multipass":
        # The warp's DATA rides the configured compute dtype (bf16 halves
        # every pass/flip/transpose in both directions); geometry and pose
        # gradients stay fp32 inside the kernels.
        warp = functools.partial(
            rotate_resample_to_camera_multipass, compute_dtype=cdt
        )
    else:
        warp = rotate_resample_to_camera
    shape_cam = warp(shape, latents.pose, new_size=cfg.new_size)
    tex_cam = warp(tex.astype(jnp.float32), latents.pose, new_size=cfg.new_size)
    both = jnp.concatenate([shape_cam, tex_cam], axis=4)

    mr = Module(params=model.renderer, compute_dtype=cdt)
    albedo, normal = recon_rendernet(mr, both.astype(cdt))

    light_col = jnp.ones((b, 3), jnp.float32)
    shading = phong_composite(
        normal, light_dir, light_col, cfg.ambient, cfg.k_diffuse,
        black_background=False, with_mask=True,
    )
    compos = albedo * shading
    return compos, albedo, normal, shape


def recon_per_sample_loss(
    model: ReconModel, latents: Latents, target: jnp.ndarray, cfg: ReconConfig
) -> jnp.ndarray:
    """Per-hypothesis MSE against the shaded target image -> [B]."""
    compos, _, _, _ = recon_forward(model, latents, cfg)
    return jnp.mean((target - compos) ** 2, axis=(1, 2, 3))


def make_recon_step(
    model: ReconModel,
    cfg: ReconConfig,
    scan_steps: Optional[int] = None,
    loss_fn=None,
):
    """Build the jitted optimization step.

    Without ``scan_steps``: one SGD step, returns (latents, per-sample loss).
    With ``scan_steps``: the whole inner loop runs as a lax.scan in one
    launch, returning (latents, loss history [T, B]).
    Per-group learning rates follow the reference's 4-optimizer split.

    ``loss_fn(model, latents, target, cfg) -> [B]`` swaps the forward
    model under the same search machinery (default:
    ``recon_per_sample_loss``, the full 3-net pipeline). Any pretrained
    differentiable renderer can serve — e.g. pose(+code) recovery through
    the trained tiny nets, or a pure geometric silhouette loss in tests.

    The frozen model parameters are jit ARGUMENTS (bound via the returned
    closure), not trace-time constants — closing over ~30M weights would
    bake them into the HLO, bloating compiles (and overflowing remote-
    compile transports).
    """
    if loss_fn is None:
        loss_fn = recon_per_sample_loss

    def one_step(model: ReconModel, target: jnp.ndarray, latents: Latents):
        def loss_and_aux(l):
            per = loss_fn(model, l, target, cfg)
            return jnp.sum(per), per

        (_, per_sample), grads = jax.value_and_grad(loss_and_aux, has_aux=True)(
            latents
        )
        pose_scale = jnp.array(
            [1.0, cfg.el_eta_scale, 1.0], jnp.float32
        )  # (azimuth, ELEVATION, scale) — see el_eta_scale
        new = Latents(
            vector=latents.vector - cfg.shape_eta * grads.vector,
            pose=latents.pose - cfg.pose_eta * pose_scale * grads.pose,
            texture=latents.texture - cfg.tex_eta * grads.texture,
            light=latents.light - cfg.light_eta * grads.light,
        )
        return new, per_sample

    if scan_steps is None:

        @jax.jit
        def step_impl(model: ReconModel, latents: Latents, target: jnp.ndarray):
            return one_step(model, target, latents)

        return lambda latents, target: step_impl(model, latents, target)

    @jax.jit
    def run_impl(model: ReconModel, latents: Latents, target: jnp.ndarray):
        return jax.lax.scan(
            lambda carry, _: one_step(model, target, carry), latents, None,
            length=scan_steps,
        )

    return lambda latents, target: run_impl(model, latents, target)


def create_param_center(
    phi_mid: float,
    phi_range: float,
    theta_mid: float,
    theta_range: float,
    batch_size: int = 5,
    shape: str = "corners",
) -> np.ndarray:
    """5 pose hypotheses spanning the current search box (degrees in,
    radians out).

    ``shape="corners"`` is the reference's grid
    (Reconstruct_RenderNet_Face.py:304-318, including the %360 azimuth
    wrap and the theta->elevation mapping): the four box corners plus the
    center — an "X". Its failure mode, measured at reference scale
    (inverse_render_refscale_trained_r4.json): theta only ever appears
    PAIRED with a phi corner, so once azimuth has converged (it does,
    via the pose gradient) every off-center-theta hypothesis also
    carries a wrong azimuth and loses the best-of-batch selection — the
    box then halves around a wrong elevation forever (el err 8.6° ->
    9.4° over 10 epochs).

    ``shape="cross"`` decouples the axes: (phi±range/2, theta_mid),
    center, (phi_mid, theta±range/2) — a "+". Per-axis selection then
    bisects each angle independently: picking the nearer theta arm each
    epoch while the box halves converges theta like binary search, with
    azimuth held at its converged value. Same budget, same count of
    hypotheses.
    """
    phi_min = ((phi_mid - phi_range * 0.5) % 360) * math.pi / 180.0
    phi_max = ((phi_mid + phi_range * 0.5) % 360) * math.pi / 180.0
    theta_min = (90 - (theta_mid - theta_range * 0.5)) * math.pi / 180.0
    theta_max = (90 - (theta_mid + theta_range * 0.5)) * math.pi / 180.0
    phi_mid_r = phi_mid * math.pi / 180.0
    theta_mid_r = (90 - theta_mid) * math.pi / 180.0

    params = np.zeros((batch_size, 3), np.float32)
    if shape == "corners":
        grid = [
            (phi_min, theta_min),
            (phi_min, theta_max),
            (phi_mid_r, theta_mid_r),
            (phi_max, theta_min),
            (phi_max, theta_max),
        ]
    elif shape == "cross":
        grid = [
            (phi_min, theta_mid_r),
            (phi_max, theta_mid_r),
            (phi_mid_r, theta_mid_r),
            (phi_mid_r, theta_min),
            (phi_mid_r, theta_max),
        ]
    else:
        raise ValueError(f"unknown grid shape {shape!r}")
    for i in range(batch_size):
        phi, theta = grid[i % len(grid)]
        params[i] = (phi, theta, 1.0)
    return params


def initial_latents(cfg: ReconConfig, seed: int = 0) -> Latents:
    """First-epoch initialization (:461-465): z = 0.5, random texture,
    light azimuths linspaced over [230, 320] degrees."""
    rng = np.random.default_rng(seed)
    pose = create_param_center(
        cfg.phi_mid0, cfg.phi_range0, cfg.theta_mid0, cfg.theta_range0,
        cfg.batch_size, shape=cfg.grid_shape,
    )
    light = np.linspace(230, 320, num=cfg.batch_size)[:, None] * math.pi / 180.0
    return Latents(
        vector=jnp.full((cfg.batch_size, cfg.z_dim), 0.5, jnp.float32),
        pose=jnp.asarray(pose),
        texture=jnp.asarray(rng.standard_normal((cfg.batch_size, cfg.texture_dim)),
                            dtype=jnp.float32),
        light=jnp.asarray(light, dtype=jnp.float32),
    )


def subdivided_latents(
    best: Latents, best_idx: int, phi_range: float, theta_range: float,
    cfg: ReconConfig,
) -> Latents:
    """Next-epoch init: tile the best hypothesis, subdivide the pose box
    around it (:466-473; degree conversion dance of :530-534)."""
    best_pose_deg = np.asarray(best.pose[best_idx]) * 180.0 / math.pi
    phi_mid = float(best_pose_deg[0])
    theta_mid = 90.0 - float(best_pose_deg[1])
    pose = create_param_center(phi_mid, phi_range, theta_mid, theta_range,
                               cfg.batch_size, shape=cfg.grid_shape)
    tile = lambda x: jnp.tile(jnp.asarray(x)[best_idx][None], (cfg.batch_size, 1))
    return Latents(
        vector=tile(best.vector),
        pose=jnp.asarray(pose),
        texture=tile(best.texture),
        light=tile(best.light),
    )


def reconstruct(
    model: ReconModel,
    target: jnp.ndarray,
    cfg: ReconConfig,
    seed: int = 0,
    callback=None,
    run=None,
    dump_every: Optional[int] = None,
    inner_callback=None,
    loss_fn=None,
    initial: Optional[Latents] = None,
) -> Tuple[Latents, np.ndarray, np.ndarray]:
    """Full coarse-to-fine reconstruction driver.

    Returns ``(latents, final_losses [epochs, B], loss_curves
    [epochs, inner_steps, B])`` — the full per-hypothesis loss history the
    scan already computes (reference per-step observability:
    Reconstruct_RenderNet_Face.py:415-416). ``callback(epoch, latents,
    losses)`` fires after each epoch for logging/dumps.

    ``dump_every=K`` runs the inner loop as chunked scans of K steps (K
    must divide ``inner_steps``) and fires ``inner_callback(epoch,
    inner_step, latents, losses_chunk [K, B])`` after each chunk — the
    TPU-shaped analog of the reference's every-100-step intermediate dumps
    (:497-519): the scan stays on-device; only the chunk boundary syncs.

    ``run`` reuses an existing ``make_recon_step(model, cfg,
    scan_steps=...)`` runner (compiling the 3-network pipeline dominates
    cold-start; pass it when reconstructing several targets with one
    model/config; its scan_steps must equal ``dump_every`` when set, else
    ``cfg.inner_steps``).
    """
    chunk = dump_every or cfg.inner_steps
    if cfg.inner_steps % chunk:
        raise ValueError(
            f"dump_every={dump_every} must divide inner_steps={cfg.inner_steps}"
        )
    if run is None:
        run = make_recon_step(model, cfg, scan_steps=chunk, loss_fn=loss_fn)
    run_frozen = None
    if cfg.warmup_freeze_epochs > 0:
        # Same machinery with texture/light etas zeroed: pose-only
        # ranking during the warmup window (see warmup_freeze_epochs).
        run_frozen = make_recon_step(
            model,
            dataclasses.replace(cfg, tex_eta=0.0, light_eta=0.0),
            scan_steps=chunk, loss_fn=loss_fn,
        )
    latents = initial_latents(cfg, seed) if initial is None else initial
    phi_range, theta_range = cfg.phi_range0, cfg.theta_range0
    theta_pending = False
    if cfg.sequence_axes:
        if cfg.halve_mode != "on_center":
            raise ValueError("sequence_axes requires halve_mode='on_center'")
        # phase A: azimuth only — theta opens on the first center win
        theta_range = 0.0
        theta_pending = cfg.theta_range0 > 0
        if initial is None:
            pose = create_param_center(
                cfg.phi_mid0, cfg.phi_range0, cfg.theta_mid0, 0.0,
                cfg.batch_size, shape=cfg.grid_shape,
            )
            latents = latents._replace(pose=jnp.asarray(pose))
    history = []
    curves = []
    for epoch in range(cfg.max_epochs):
        epoch_run = (
            run_frozen
            if run_frozen is not None and epoch < cfg.warmup_freeze_epochs
            else run
        )
        chunks = []
        for ci in range(cfg.inner_steps // chunk):
            latents, losses = epoch_run(latents, target)
            chunks.append(np.asarray(losses))
            if inner_callback is not None:
                inner_callback(epoch, (ci + 1) * chunk, latents, chunks[-1])
        curve = np.concatenate(chunks, axis=0)  # [inner_steps, B]
        curves.append(curve)
        final = curve[-1]
        history.append(final)
        best_idx = int(final.argmin())
        if callback is not None:
            callback(epoch, latents, final)
        if epoch + 1 < cfg.max_epochs:
            # "always": the reference's schedule (halve every epoch,
            # :458-473). "on_center": pattern search — halve only when
            # the center hypothesis won; a winning off-center arm means
            # the optimum is still outside the shrinking box, so move
            # the box (subdivided_latents re-centers on the winner)
            # without shrinking it. With sequence_axes, the first center
            # win instead OPENS the theta box (azimuth is resolved; the
            # elevation signal is live from here — see the config note).
            if cfg.halve_mode == "always" or best_idx % 5 == 2:
                phi_range /= 2.0
                if theta_pending:
                    theta_range = cfg.theta_range0
                    theta_pending = False
                else:
                    theta_range /= 2.0
            latents = subdivided_latents(
                latents, best_idx, phi_range, theta_range, cfg
            )
    return latents, np.stack(history), np.stack(curves)
