"""Jitted train/eval steps for the shader and texture workloads.

Loss semantics mirror the reference graphs:
  * shader greyscale: summed-per-image BCE, mean over batch
    (RenderNet_Shader.py:160-161, with the 1e-6 log guards);
  * shader RGB: mean squared error (:163);
  * texture/face: MSE(albedo) + MSE(normal)
    (RenderNet_Texture_Face_Normal.py:182-183).

TPU design: one pure step function per (patch size, mode) — shapes static,
state donated, params fp32 with a configurable compute dtype (bf16 on the
MXU), the rotate+resample and random crop fused into the same XLA program as
the network so each step is a single device launch.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from rendernet_tpu.models.shader import ShaderConfig, shader_rendernet
from rendernet_tpu.models.texture_face import (
    TextureFaceConfig,
    texture_decoder,
    texture_face_rendernet,
)
from rendernet_tpu.nn.layers import Module, Params
from rendernet_tpu.ops.crops import crop_image, random_crop_offsets
from rendernet_tpu.ops.pallas_resample import (
    rotate_resample_camera_patch_multipass,
    rotate_resample_to_camera_multipass,
)
from rendernet_tpu.ops.resample import (
    rotate_resample_camera_patch,
    rotate_resample_to_camera,
)
from rendernet_tpu.train.config import TrainConfig
from rendernet_tpu.train.optim import make_optimizer

__all__ = [
    "TrainState",
    "create_shader_state",
    "make_shader_train_step",
    "make_shader_eval_step",
    "create_texture_state",
    "make_texture_train_step",
    "shader_loss_from_images",
]


class TrainState(NamedTuple):
    params: Params
    opt_state: optax.OptState
    step: jnp.ndarray  # scalar int32


# Texture step: resample the channel-concatenated shape+texture grid in
# ONE pass when resolutions match (exact same math — see the note in
# make_texture_train_step). Module-level so benchmarks can A/B it.
# DEFAULT OFF per the round-5 end-to-end A/B (texture_bench_r5.json):
# the two-pass form is FASTER — 27.42 vs 27.08 frames/s full-512 and
# 72.39 vs 69.50 at patch 64 — because the un-differentiated C=1 voxel
# pass's adjoint is DCE'd entirely, while fusing drags the voxel channel
# into the C=5 custom-VJP warp and pays its adjoint every step
# (docs/performance.md "Fused vs two-pass resample").
FUSE_TEXTURE_RESAMPLE = False


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def _resample_method(cfg: TrainConfig) -> str:
    if cfg.resample == "auto":
        return "multipass" if jax.default_backend() == "tpu" else "exact"
    return cfg.resample


def _resample_full(voxels, poses, cfg: TrainConfig):
    """Full camera-aligned grid via the configured resample kernel."""
    if _resample_method(cfg) == "multipass":
        return rotate_resample_to_camera_multipass(
            voxels, poses, new_size=cfg.new_size, max_scale=cfg.pose_scale_limit,
            compute_dtype=_dtype(cfg.compute_dtype),
        )
    return rotate_resample_to_camera(voxels, poses, new_size=cfg.new_size)


def _resample_patch(voxels, poses, offsets, patch_size, cfg: TrainConfig):
    """Cropped camera-aligned patch. Both paths fuse the crop into the
    resample: the exact path restricts the gathers to the window; the
    multipass path emits only the window in each cropped axis's final
    interp pass."""
    if _resample_method(cfg) == "multipass":
        return rotate_resample_camera_patch_multipass(
            voxels, poses, offsets, patch_size, new_size=cfg.new_size,
            max_scale=cfg.pose_scale_limit,
            compute_dtype=_dtype(cfg.compute_dtype),
        )
    return rotate_resample_camera_patch(
        voxels, poses, offsets, patch_size, new_size=cfg.new_size
    )


def _as_f32_image(images):
    """Accept uint8 [0,255] (compact host->device feed — 4x less interconnect
    traffic, lossless for PNG-derived data) or float [0,1]."""
    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) / 255.0
    return images


def _as_f32(x):
    return x.astype(jnp.float32) if x.dtype != jnp.float32 else x


def _accumulated_value_and_grad(loss_fn, params, batch_arrays, accum: int):
    """Mean loss and gradient over ``accum`` microbatches via lax.scan.

    ``loss_fn(params, *microbatch)`` must be a MEAN-reduced loss (all ours
    are), so averaging per-microbatch grads of equal sizes reproduces the
    full-batch gradient exactly; fp32 accumulators. One live microbatch of
    activations instead of the whole batch."""
    b = batch_arrays[0].shape[0]
    if b % accum:
        raise ValueError(f"batch size {b} not divisible by grad_accum={accum}")
    micro = tuple(
        a.reshape(accum, b // accum, *a.shape[1:]) for a in batch_arrays
    )
    vg = jax.value_and_grad(loss_fn)

    def acc_dtype(p):  # at least fp32; follows f64 params under x64
        return jnp.promote_types(jnp.result_type(p), jnp.float32)

    def body(carry, xs):
        loss_sum, grad_sum = carry
        loss, grads = vg(params, *xs)
        grad_sum = jax.tree.map(
            lambda s, g: s + g.astype(s.dtype), grad_sum, grads
        )
        return (loss_sum + loss.astype(loss_sum.dtype), grad_sum), None

    zeros = jax.tree.map(
        lambda p: jnp.zeros(jnp.shape(p), acc_dtype(p)), params
    )
    loss0 = jnp.zeros((), acc_dtype(jax.tree.leaves(params)[0]))
    (loss_sum, grad_sum), _ = jax.lax.scan(body, (loss0, zeros), micro)
    scale = 1.0 / accum
    return loss_sum * scale, jax.tree.map(lambda g: g * scale, grad_sum)


def shader_loss_from_images(
    pred: jnp.ndarray, target: jnp.ndarray, greyscale: bool
) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if greyscale:
        bce = target * jnp.log(1e-6 + pred) + (1.0 - target) * jnp.log(
            1e-6 + 1.0 - pred
        )
        return jnp.mean(-jnp.sum(bce, axis=(1, 2, 3)))
    return jnp.mean((pred - target) ** 2)


# ---------------------------------------------------------------------------
# shader workload
# ---------------------------------------------------------------------------
def create_shader_state(
    rng: jax.Array, model_cfg: ShaderConfig, cfg: TrainConfig
) -> Tuple[TrainState, optax.GradientTransformation]:
    from rendernet_tpu.models.shader import init_shader_params

    params = init_shader_params(rng, model_cfg)
    tx = make_optimizer(cfg.e_eta, cfg.decay_steps, cfg.decay_rate,
                        skip_nonfinite=cfg.skip_nonfinite_updates,
                        moment_dtype=cfg.moment_dtype)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def _use_bf16_allreduce(cfg: TrainConfig, mesh) -> bool:
    return (
        cfg.allreduce_dtype == "bfloat16"
        and mesh is not None
        and mesh.shape.get("data", 1) > 1
    )


def _shard_map_value_and_grad(vg_local, mesh, n_batch_args: int):
    """Wrap a per-shard (params, *batch, rng) -> (loss, grads) function in a
    shard_map that all-reduces the GRADIENTS IN BF16 over the 'data' axis
    (halves gradient-collective bytes — ~1.66 GB -> 0.83 GB for the shader
    net, the comms fallback documented in train/distributed.py). Loss is
    pmean'd in fp32. Params/rng replicated, batch sharded on axis 0; the
    pmean of equal-size shard-mean losses/grads reproduces the global mean.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def wrapped(params, *batch_and_rng):
        loss, grads = vg_local(params, *batch_and_rng)
        grads = jax.tree.map(lambda g: g.astype(jnp.bfloat16), grads)
        grads = jax.lax.pmean(grads, "data")
        grads = jax.tree.map(lambda g: g.astype(jnp.float32), grads)
        loss = jax.lax.pmean(loss.astype(jnp.float32), "data")
        return loss, grads

    in_specs = (P(),) + (P("data"),) * n_batch_args + (P(),)
    return shard_map(
        wrapped, mesh=mesh, in_specs=in_specs, out_specs=(P(), P())
    )


def make_shader_train_step(
    model_cfg: ShaderConfig,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    patch_size: int,
    mesh=None,
):
    """Build the jitted training step for one patch size.

    step(state, voxels[B,64,64,64,1], images[B,512,512,C] in [0,1],
         poses[B,3], rng) -> (state, loss)

    ``mesh`` is only needed for ``cfg.allreduce_dtype="bfloat16"``: the
    gradient computation then runs under shard_map so the cross-device
    gradient all-reduce happens in bf16 (half the collective bytes; the
    optimizer update stays fp32 on the pmean'd result). The default path
    leaves sharding to XLA propagation (fp32 all-reduce).
    """
    cdt = _dtype(cfg.compute_dtype)
    greyscale = cfg.is_greyscale
    bf16_ar = _use_bf16_allreduce(cfg, mesh)

    def loss_fn(params, voxels, images, poses, rng):
        voxels = _as_f32(voxels)
        images = _as_f32_image(images)
        crop_rng, drop_rng = jax.random.split(rng)
        if bf16_ar:
            # decorrelate dropout across data shards (crop offsets stay
            # shared — one crop per global batch, like the jit path)
            drop_rng = jax.random.fold_in(
                drop_rng, jax.lax.axis_index("data")
            )
        if patch_size == cfg.new_size:
            vox_c = _resample_full(voxels, poses, cfg)
            img_c = images
        else:
            offsets = random_crop_offsets(crop_rng, cfg.new_size, patch_size)
            vox_c = _resample_patch(voxels, poses, offsets, patch_size, cfg)
            img_c = crop_image(
                images, offsets, patch_size, images.shape[1] // cfg.new_size
            )
        m = Module(params=params, compute_dtype=cdt, train=True, dropout_rng=drop_rng)
        pred = shader_rendernet(m, vox_c.astype(cdt), model_cfg)
        return shader_loss_from_images(pred, img_c, greyscale)

    accum = cfg.grad_accum_steps

    def vg_local(params, voxels, images, poses, rng):
        if accum > 1:
            return _accumulated_value_and_grad(
                lambda p, v, i, q: loss_fn(p, v, i, q, rng),
                params, (voxels, images, poses), accum,
            )
        return jax.value_and_grad(loss_fn)(params, voxels, images, poses, rng)

    def step(state: TrainState, voxels, images, poses, rng):
        rng = jax.random.fold_in(rng, state.step)
        if bf16_ar:
            loss, grads = _shard_map_value_and_grad(vg_local, mesh, 3)(
                state.params, voxels, images, poses, rng
            )
        else:
            loss, grads = vg_local(state.params, voxels, images, poses, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))


def make_shader_eval_step(model_cfg: ShaderConfig, cfg: TrainConfig):
    """Full-resolution inference step: (params, voxels, poses) -> images."""
    cdt = _dtype(cfg.compute_dtype)

    def step(params, voxels, poses):
        cam = _resample_full(_as_f32(voxels), poses, cfg)
        m = Module(params=params, compute_dtype=cdt)
        return shader_rendernet(m, cam.astype(cdt), model_cfg)

    return jax.jit(step)


# ---------------------------------------------------------------------------
# texture / face workload
# ---------------------------------------------------------------------------
def create_texture_state(
    rng: jax.Array, model_cfg: TextureFaceConfig, cfg: TrainConfig
) -> Tuple[TrainState, optax.GradientTransformation]:
    from rendernet_tpu.models.texture_face import init_texture_face_params

    params = init_texture_face_params(rng, model_cfg)
    tx = make_optimizer(cfg.e_eta, cfg.decay_steps, cfg.decay_rate,
                        skip_nonfinite=cfg.skip_nonfinite_updates,
                        moment_dtype=cfg.moment_dtype)
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def make_texture_train_step(
    model_cfg: TextureFaceConfig,
    cfg: TrainConfig,
    tx: optax.GradientTransformation,
    patch_size: int,
    mesh=None,
):
    """step(state, voxels, images, normals, textures, poses, rng)
    -> (state, loss). Images/normals in [0,1]. ``mesh``: see
    :func:`make_shader_train_step` (bf16 gradient all-reduce opt-in)."""
    cdt = _dtype(cfg.compute_dtype)
    bf16_ar = _use_bf16_allreduce(cfg, mesh)

    def loss_fn(params, voxels, images, normals, textures, poses, rng):
        voxels = _as_f32(voxels)
        images = _as_f32_image(images)
        normals = _as_f32_image(normals)
        crop_rng, drop_rng = jax.random.split(rng)
        if bf16_ar:
            drop_rng = jax.random.fold_in(
                drop_rng, jax.lax.axis_index("data")
            )
        m = Module(params=params, compute_dtype=cdt, train=True, dropout_rng=drop_rng)
        tex_grid = texture_decoder(
            m, textures.astype(cdt), tex_base=model_cfg.tex_base,
            tex_grid=model_cfg.tex_grid,
        ).astype(jnp.float32)
        # When the shape and texture grids share a resolution (they do at
        # reference scale: both 64^3), run ONE resample over the
        # channel-concatenated [B,64,64,64,1+4] grid instead of the
        # reference's two independent passes
        # (RenderNet_Texture_Face_Normal.py:165-172): the warp is linear
        # and per-channel, so resample(concat) == concat(resample) exactly
        # — but the pass plan, index math and kernel launches are shared.
        # (texture_face_forward keeps the reference's two-pass graph for
        # parity; this is the training-step fast path.)
        fused = (
            FUSE_TEXTURE_RESAMPLE
            and voxels.shape[1:4] == tex_grid.shape[1:4]
        )
        grids = ([jnp.concatenate([voxels, tex_grid], axis=4)] if fused
                 else [voxels, tex_grid])
        if patch_size == cfg.new_size:
            cams = [_resample_full(g, poses, cfg) for g in grids]
            img_c, nrm_c = images, normals
        else:
            offsets = random_crop_offsets(crop_rng, cfg.new_size, patch_size)
            cams = [
                _resample_patch(g, poses, offsets, patch_size, cfg)
                for g in grids
            ]
            factor = images.shape[1] // cfg.new_size
            img_c = crop_image(images, offsets, patch_size, factor)
            nrm_c = crop_image(normals, offsets, patch_size, factor)
        both_c = cams[0] if fused else jnp.concatenate(cams, axis=4)
        albedo, normal_pred = texture_face_rendernet(
            m, both_c.astype(cdt), model_cfg
        )
        return shader_loss_from_images(
            albedo, img_c, greyscale=False
        ) + shader_loss_from_images(normal_pred, nrm_c, greyscale=False)

    accum = cfg.grad_accum_steps

    def vg_local(params, voxels, images, normals, textures, poses, rng):
        if accum > 1:
            return _accumulated_value_and_grad(
                lambda p, v, i, n, t, q: loss_fn(p, v, i, n, t, q, rng),
                params, (voxels, images, normals, textures, poses), accum,
            )
        return jax.value_and_grad(loss_fn)(
            params, voxels, images, normals, textures, poses, rng
        )

    def step(state: TrainState, voxels, images, normals, textures, poses, rng):
        rng = jax.random.fold_in(rng, state.step)
        if bf16_ar:
            loss, grads = _shard_map_value_and_grad(vg_local, mesh, 5)(
                state.params, voxels, images, normals, textures, poses, rng
            )
        else:
            loss, grads = vg_local(
                state.params, voxels, images, normals, textures, poses, rng
            )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(step, donate_argnums=(0,))
