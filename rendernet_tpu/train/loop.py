"""Epoch-level training drivers (shader + texture workloads).

Capability-parity target: the runtime loops of RenderNet_Shader.py:179-306
and RenderNet_Texture_Face_Normal.py:200-335 — patch curriculum, chunked
data streaming, periodic sample dumps, per-epoch validation with mean-L1
logging, config snapshot into the run dir, and checkpoint autosave.

TPU re-design: steps are jit-compiled per patch size (two specializations
over the curriculum); batches are sharded over the data mesh; metrics are
accumulated on host from device scalars; checkpoints are Orbax.
"""
from __future__ import annotations

import json
import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rendernet_tpu.data.loaders import data_loader, data_loader_image_texture_normal_face
from rendernet_tpu.data.prefetch import prefetch
from rendernet_tpu.models.shader import ShaderConfig
from rendernet_tpu.models.texture_face import TextureFaceConfig
from rendernet_tpu.train.checkpoint import (
    restore_checkpoint,
    save_checkpoint,
    save_params_npz,
)
from rendernet_tpu.train.config import TrainConfig
from rendernet_tpu.train.distributed import (
    make_hybrid_mesh,
    make_mesh,
    process_shard,
    replicate,
    shard_batch,
)
from rendernet_tpu.train.steps import (
    create_shader_state,
    create_texture_state,
    make_shader_eval_step,
    make_shader_train_step,
    make_texture_train_step,
)
from rendernet_tpu.utils.image import save_image, to_uint8

__all__ = ["train_shader", "train_texture"]


def _halt_if_rejecting(cfg: TrainConfig, run, state, global_step: int,
                       epoch: int) -> None:
    """Halt once the optimizer has rejected ``skip_nonfinite_updates``
    consecutive updates (reject_nonfinite never accepts a bad update, so
    params stay clean — this is pure failure DETECTION). Reading the
    count is a device fetch, so callers invoke this only at points that
    already sync (non-finite loss, periodic logging, checkpoint writes).
    A burst that self-clears between sync points is deliberately
    tolerated — params were never touched — and remains visible in the
    cumulative ``total_notfinite`` reported with the next rejection
    event."""
    consecutive = int(state.opt_state.notfinite_count)
    if consecutive == 0:
        return
    run.log(step=global_step, epoch=epoch,
            event="nonfinite_updates_rejected", consecutive=consecutive,
            total=int(state.opt_state.total_notfinite))
    if consecutive >= cfg.skip_nonfinite_updates:
        raise FloatingPointError(
            f"{consecutive} consecutive non-finite gradient updates as of "
            f"step {global_step} (params remain clean — updates were "
            f"rejected on-device); halting"
        )


class _PipelinedGuard:
    """Run the non-finite-loss check one step LATE, so its host fetch of
    the loss happens with the next step already enqueued — the device
    never idles for the check (a per-step sync otherwise costs a full
    dispatch bubble; ~70 ms RTT on a tunneled platform). The guard reads
    the LATEST state (params are protected on-device by reject_nonfinite,
    so a one-step-stale halt loses nothing)."""

    def __init__(self, cfg: TrainConfig, run):
        self.cfg, self.run = cfg, run
        self.pending = None  # (device loss, global_step, epoch)

    def push(self, loss, state, global_step: int, epoch: int) -> None:
        prev, self.pending = self.pending, (loss, global_step, epoch)
        if prev is not None:
            _guard_loss(self.cfg, self.run, state, prev[1], prev[2],
                        float(prev[0]))

    def flush(self, state) -> None:
        if self.pending is not None:
            prev, self.pending = self.pending, None
            _guard_loss(self.cfg, self.run, state, prev[1], prev[2],
                        float(prev[0]))


def _guard_loss(cfg: TrainConfig, run, state, global_step: int, epoch: int,
                loss: float) -> None:
    """Non-finite-loss policy (failure detection/recovery — SURVEY.md §5;
    the reference has none). With ``skip_nonfinite_updates`` the optimizer
    rejects bad-gradient updates on-device, so training continues through
    transient spikes and we only halt on persistent failure; without it a
    non-finite loss halts immediately."""
    if not (cfg.nan_guard and not np.isfinite(loss)):
        return
    if cfg.skip_nonfinite_updates > 0:
        _halt_if_rejecting(cfg, run, state, global_step, epoch)
        return
    run.log(step=global_step, epoch=epoch, loss=loss, event="non_finite_loss")
    raise FloatingPointError(f"non-finite loss {loss} at step {global_step}")


def _profile_window(cfg: TrainConfig, global_step: int) -> None:
    """Start/stop a jax.profiler trace around the configured step window
    (observability upgrade over the reference's wall-clock prints,
    SURVEY.md section 5)."""
    if not cfg.profile_dir:
        return
    if global_step == cfg.profile_start_step:
        jax.profiler.start_trace(cfg.profile_dir)
    elif global_step == cfg.profile_start_step + cfg.profile_steps:
        jax.profiler.stop_trace()


def _check_pose_scales(poses: np.ndarray, cfg: TrainConfig) -> None:
    """Guard for the narrowed multipass adjoint band: every pose scale must
    respect the configured static bound, or voxel gradients would silently
    lose band taps (ops.pallas_resample.build_pass_plan)."""
    if cfg.pose_scale_limit is None or poses.shape[-1] < 3:
        return
    top = float(np.max(poses[..., 2]))
    if top > cfg.pose_scale_limit:
        raise ValueError(
            f"pose scale {top:.4f} exceeds pose_scale_limit="
            f"{cfg.pose_scale_limit}; raise the limit (or unset it) — "
            f"gradients would be wrong"
        )


def _maybe_resume(ckpt_dir: str, state, run):
    """Crash-resume: restore the last checkpoint if one exists in the run
    dir (parity with tf.train.Supervisor's auto-restore,
    RenderNet_Shader.py:179-187)."""
    has_orbax = os.path.isdir(ckpt_dir) and os.listdir(ckpt_dir)
    if has_orbax or os.path.exists(ckpt_dir + ".npz"):  # multi-host flat form
        try:
            state = restore_checkpoint(ckpt_dir, state)
        except Exception as e:
            raise RuntimeError(
                f"could not restore the checkpoint in {ckpt_dir} against the "
                "current optimizer-state structure. This happens when "
                "skip_nonfinite_updates was toggled between runs (it wraps "
                "the optimizer state). Start a fresh run dir — params carry "
                "over via its params_latest.npz — or restore with the "
                "original setting."
            ) from e
        run.log(resumed_at_step=int(state.step))
    return state


def _auto_mesh(cfg: TrainConfig, run=None):
    """Data mesh over the largest device count that divides the batch.

    Multi-process runs get the DCN-aware hybrid layout (all devices; the
    global batch must divide evenly there). The decision — and especially
    any devices left idle because the batch doesn't divide — is logged
    visibly instead of silently shrinking the mesh."""
    if jax.process_count() > 1:
        mesh = make_hybrid_mesh()
        if run is not None:
            run.log(event="mesh", layout="hybrid_dcn",
                    devices=len(jax.devices()),
                    processes=jax.process_count())
        return mesh
    n_avail = cfg.data_parallel or len(jax.devices())
    n_data = n_avail
    while cfg.batch_size % n_data:
        n_data -= 1
    if n_data < n_avail:
        msg = (f"[mesh] batch_size={cfg.batch_size} is not divisible by "
               f"{n_avail} devices; using {n_data} and leaving "
               f"{n_avail - n_data} idle — pick a batch size that divides "
               f"the device count to use the whole chip set")
        print(msg, flush=True)
    if run is not None:
        run.log(event="mesh", layout="data", data_devices=n_data,
                devices_available=n_avail, idle_devices=n_avail - n_data)
    return make_mesh(n_data)


class _RunDir:
    def __init__(self, cfg: TrainConfig):
        self.root = cfg.sample_save
        os.makedirs(self.root, exist_ok=True)
        cfg.to_json(os.path.join(self.root, "config.json"))
        self.metrics_path = os.path.join(self.root, "metrics.jsonl")
        self.tb = None
        if cfg.tensorboard:
            from rendernet_tpu.utils.tb import TBWriter

            # Chief-only, like the checkpoint writes.
            if jax.process_index() == 0:
                self.tb = TBWriter(os.path.join(self.root, "tb"))

    def log(self, **kv):
        with open(self.metrics_path, "a") as f:
            f.write(json.dumps(kv) + "\n")
        if self.tb is not None:
            step = int(kv.get("step", kv.get("epoch", 0) or 0))
            for k, v in kv.items():
                if (
                    k not in ("step", "epoch", "event")
                    and isinstance(v, (int, float))
                    and not isinstance(v, bool)
                ):
                    self.tb.scalar(k, float(v), step)
            self.tb.flush()

    def dump_pair(self, tag: str, step: int, pred: np.ndarray, target: np.ndarray):
        def u8(x):
            x = np.squeeze(x)
            return x if x.dtype == np.uint8 else to_uint8(x, 255.0)

        save_image(u8(pred), os.path.join(self.root, f"{tag}_{step}_pred.png"))
        save_image(u8(target), os.path.join(self.root, f"{tag}_{step}_target.png"))


def train_shader(
    cfg: TrainConfig,
    model_cfg: Optional[ShaderConfig] = None,
    max_steps: Optional[int] = None,
    use_mesh: bool = True,
    progress: Optional[Callable[[int, "jnp.ndarray"], None]] = None,
):
    """Run shader training from a TrainConfig; returns the final TrainState."""
    model_cfg = model_cfg or ShaderConfig(
        out_channels=cfg.image_channels,
        keep_prob=cfg.keep_prob,
        new_size=cfg.new_size,
    )
    run = _RunDir(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    state, tx = create_shader_state(rng, model_cfg, cfg)
    ckpt_dir = os.path.join(run.root, cfg.trained_model_name)
    state = _maybe_resume(ckpt_dir, state, run)
    mesh = _auto_mesh(cfg, run) if use_mesh else None
    if mesh is not None:
        state = replicate(mesh, state)
    steps = {}  # patch_size -> jitted step
    guard = _PipelinedGuard(cfg, run)
    eval_step = make_shader_eval_step(model_cfg, cfg)
    step_key = jax.random.PRNGKey(cfg.seed + 1)
    global_step = int(state.step)
    last_ckpt = time.time()
    chunk_cache = {}  # (chunk, batch) -> device arrays, when cfg.cache_chunks
    cache_cap_logged = False

    for epoch in range(cfg.max_epochs):
        patch = cfg.patch_size_for_epoch(epoch)
        if patch not in steps:
            steps[patch] = make_shader_train_step(
                model_cfg, cfg, tx, patch, mesh=mesh
            )
        step_fn = steps[patch]
        local_bs, pidx, pcount = process_shard(cfg.batch_size)
        loader = data_loader(
            cfg.image_path,
            cfg.model_path,
            batch_size=local_bs,
            batches_chunk=cfg.batches_chunk,
            flatten=cfg.is_greyscale,
            img_res=cfg.img_res,
            voxel_res=cfg.voxel_res,
            shard=(pidx, pcount) if pcount > 1 else None,
        )
        loader = prefetch(loader, cfg.prefetch_chunks)
        for chunk_idx, (images, voxels, poses, names) in enumerate(loader):
            _check_pose_scales(poses, cfg)
            # compact uint8 feed: 4x less host->device traffic (lossless);
            # the jitted step casts/normalizes on device.
            n_batches = len(images) // local_bs
            images_u8 = voxels_u8 = None
            for i in range(n_batches):
                if cfg.cache_chunks and (chunk_idx, i) in chunk_cache:
                    batch = chunk_cache[(chunk_idx, i)]
                else:
                    if images_u8 is None:
                        images_u8 = np.clip(images, 0, 255).astype(np.uint8)
                        voxels_u8 = voxels.astype(np.uint8)
                    sl = slice(i * local_bs, (i + 1) * local_bs)
                    batch = (
                        jnp.asarray(voxels_u8[sl]),
                        jnp.asarray(images_u8[sl]),
                        jnp.asarray(poses[sl]),
                    )
                    if mesh is not None:
                        batch = shard_batch(mesh, batch)
                    if cfg.cache_chunks:
                        # Bounded: past the cap, stream — the cache must not
                        # be able to fill device memory on a real dataset.
                        if len(chunk_cache) < cfg.cache_chunks_max_batches:
                            chunk_cache[(chunk_idx, i)] = batch
                        elif not cache_cap_logged:
                            cache_cap_logged = True
                            run.log(event="cache_chunks_cap",
                                    cached_batches=cfg.cache_chunks_max_batches)
                _profile_window(cfg, global_step)
                state, loss = step_fn(state, *batch, step_key)
                global_step += 1
                guard.push(loss, state, global_step, epoch)
                if progress is not None:
                    # device scalar, not float(): the callback decides
                    # whether to sync (a per-step fetch costs a dispatch
                    # bubble; the CLIs throttle their prints)
                    progress(global_step, loss)
                if global_step % cfg.sample_every_steps == 0:
                    run.log(step=global_step, epoch=epoch, loss=float(loss))
                    if cfg.skip_nonfinite_updates > 0:
                        # catches non-finite grads under a finite loss
                        _halt_if_rejecting(cfg, run, state, global_step, epoch)
                    if cfg.dead_step_warn:
                        # Saturation-death detection (round-5 postmortem,
                        # docs/performance.md): a net whose sigmoid outputs
                        # all saturate has IDENTICALLY-ZERO gradients —
                        # finite loss, frozen params — which no
                        # non-finite guard can see. Fingerprint one
                        # param leaf at each logging point; two identical
                        # fingerprints in a row means updates stopped.
                        k0 = next(iter(state.params))
                        fp = float(
                            jnp.abs(state.params[k0].astype(jnp.float32)).sum()
                        )
                        if fp == getattr(run, "_last_fp", None):
                            run.log(
                                step=global_step, epoch=epoch,
                                event="dead_training_warning",
                                detail="params unchanged since the last "
                                       "logging point — zero-update steps "
                                       "(saturated outputs?); lower the lr",
                            )
                        run._last_fp = fp
                    pred = eval_step(state.params, batch[0], batch[2])
                    run.dump_pair(
                        f"train_{names[i * local_bs]}",
                        global_step,
                        np.asarray(pred[0]),
                        np.asarray(batch[1][0]),
                    )
                if time.time() - last_ckpt > cfg.checkpoint_secs:
                    # settle the guard first: never checkpoint params a
                    # pending non-finite loss would have halted on
                    guard.flush(state)
                    save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state))
                    save_params_npz(
                        os.path.join(run.root, "params_latest.npz"),
                        jax.tree.map(np.asarray, state.params),
                    )
                    last_ckpt = time.time()
                if max_steps is not None and global_step >= max_steps:
                    guard.flush(state)
                    save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state))
                    return state

        # ---- per-epoch checkpoint (time-throttled) + validation ----
        guard.flush(state)
        # Epoch boundaries checkpoint only when checkpoint_secs has elapsed:
        # an unconditional save costs a full state D2H (~25 s for 30 M params
        # over the tunneled link), which dominates wall time on small-epoch
        # datasets (the reference's Supervisor autosave is time-based too).
        if time.time() - last_ckpt > cfg.checkpoint_secs:
            save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state))
            last_ckpt = time.time()
        if cfg.image_path_valid and os.path.exists(cfg.image_path_valid):
            # Multi-host-safe validation: each process strides a disjoint
            # subset of the validation tar (no duplicated reads/evals), and
            # single-process runs shard each eval batch over the data mesh
            # so every local device contributes. Per-process sums aggregate
            # once per epoch (one collective, no per-batch lockstep).
            valid = data_loader(
                cfg.image_path_valid,
                cfg.model_path,
                batch_size=local_bs,
                validation_mode=True,
                flatten=cfg.is_greyscale,
                img_res=cfg.img_res,
                voxel_res=cfg.voxel_res,
                shard=(pidx, pcount) if pcount > 1 else None,
            )
            # Per-batch L1s stay on device; ONE host sync fetches the whole
            # epoch's stack (a float() per batch costs a dispatch bubble
            # each — ~70 ms RTT on the tunneled platform).
            l1_parts = []
            for images, voxels, poses, names in valid:
                vb = (jnp.asarray(voxels), jnp.asarray(poses),
                      jnp.asarray((images / 255.0).astype(np.float32)))
                if mesh is not None and pcount == 1:
                    vb = shard_batch(mesh, vb)
                pred = eval_step(state.params, vb[0], vb[1])
                l1_parts.append(jnp.mean(jnp.abs(vb[2] - pred)))
            l1_sum = float(np.sum(jax.device_get(l1_parts))) if l1_parts else 0.0
            l1_n = len(l1_parts)
            if pcount > 1:
                from jax.experimental import multihost_utils

                totals = multihost_utils.process_allgather(
                    np.asarray([l1_sum, float(l1_n)], np.float32)
                )
                l1_sum = float(np.sum(totals[..., 0]))
                l1_n = int(np.sum(totals[..., 1]))
            if l1_n:
                # step= keeps the TB mirror's x-axis consistent with the
                # train-loss scalars (both in global steps, not epochs).
                run.log(step=global_step, epoch=epoch, valid_l1=l1_sum / l1_n)
    save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state))
    save_params_npz(os.path.join(run.root, "params_final.npz"),
                    jax.tree.map(np.asarray, state.params))
    return state


def train_texture(
    cfg: TrainConfig,
    model_cfg: Optional[TextureFaceConfig] = None,
    max_steps: Optional[int] = None,
    use_mesh: bool = True,
    progress: Optional[Callable[[int, "jnp.ndarray"], None]] = None,
):
    """Run texture/normal face training; returns the final TrainState."""
    model_cfg = model_cfg or TextureFaceConfig(
        keep_prob=cfg.keep_prob, new_size=cfg.new_size
    )
    run = _RunDir(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    state, tx = create_texture_state(rng, model_cfg, cfg)
    ckpt_dir = os.path.join(run.root, cfg.trained_model_name)
    state = _maybe_resume(ckpt_dir, state, run)
    mesh = _auto_mesh(cfg, run) if use_mesh else None
    if mesh is not None:
        state = replicate(mesh, state)
    steps = {}
    guard = _PipelinedGuard(cfg, run)
    step_key = jax.random.PRNGKey(cfg.seed + 1)
    global_step = int(state.step)
    last_ckpt = time.time()
    chunk_cache = {}  # (chunk, batch) -> device arrays, when cfg.cache_chunks
    cache_cap_logged = False

    for epoch in range(cfg.max_epochs):
        patch = cfg.patch_size_for_epoch(epoch)
        if patch not in steps:
            steps[patch] = make_texture_train_step(
                model_cfg, cfg, tx, patch, mesh=mesh
            )
        step_fn = steps[patch]
        local_bs, pidx, pcount = process_shard(cfg.batch_size)
        loader = data_loader_image_texture_normal_face(
            cfg.image_path,
            cfg.model_path,
            cfg.texture_path,
            cfg.normal_path,
            batch_size=local_bs,
            batches_chunk=cfg.batches_chunk,
            img_res=cfg.img_res,
            voxel_res=cfg.voxel_res,
            shard=(pidx, pcount) if pcount > 1 else None,
        )
        loader = prefetch(loader, cfg.prefetch_chunks)
        for chunk_idx, (images, normals, voxels, textures, poses, names) in (
            enumerate(loader)
        ):
            _check_pose_scales(poses, cfg)
            n_batches = len(images) // local_bs
            images_u8 = normals_u8 = voxels_u8 = None
            for i in range(n_batches):
                if cfg.cache_chunks and (chunk_idx, i) in chunk_cache:
                    batch = chunk_cache[(chunk_idx, i)]
                else:
                    if images_u8 is None:
                        images_u8 = np.clip(images, 0, 255).astype(np.uint8)
                        normals_u8 = np.clip(normals, 0, 255).astype(np.uint8)
                        voxels_u8 = voxels.astype(np.uint8)
                    sl = slice(i * local_bs, (i + 1) * local_bs)
                    batch = (
                        jnp.asarray(voxels_u8[sl]),
                        jnp.asarray(images_u8[sl]),
                        jnp.asarray(normals_u8[sl]),
                        jnp.asarray(textures[sl]),
                        jnp.asarray(poses[sl]),
                    )
                    if mesh is not None:
                        batch = shard_batch(mesh, batch)
                    if cfg.cache_chunks:
                        # Bounded cache (see train_shader): past the cap,
                        # stream — a real dataset cannot OOM the device.
                        if len(chunk_cache) < cfg.cache_chunks_max_batches:
                            chunk_cache[(chunk_idx, i)] = batch
                        elif not cache_cap_logged:
                            cache_cap_logged = True
                            run.log(event="cache_chunks_cap",
                                    cached_batches=cfg.cache_chunks_max_batches)
                _profile_window(cfg, global_step)
                state, loss = step_fn(state, *batch, step_key)
                global_step += 1
                guard.push(loss, state, global_step, epoch)
                if progress is not None:
                    # device scalar, not float(): the callback decides
                    # whether to sync (a per-step fetch costs a dispatch
                    # bubble; the CLIs throttle their prints)
                    progress(global_step, loss)
                if global_step % cfg.sample_every_steps == 0:
                    run.log(step=global_step, epoch=epoch, loss=float(loss))
                    if cfg.skip_nonfinite_updates > 0:
                        _halt_if_rejecting(cfg, run, state, global_step, epoch)
                if time.time() - last_ckpt > cfg.checkpoint_secs:
                    # settle the guard first: never checkpoint params a
                    # pending non-finite loss would have halted on
                    guard.flush(state)
                    save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state))
                    save_params_npz(
                        os.path.join(run.root, "params_latest.npz"),
                        jax.tree.map(np.asarray, state.params),
                    )
                    last_ckpt = time.time()
                if max_steps is not None and global_step >= max_steps:
                    guard.flush(state)
                    save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state))
                    return state
        guard.flush(state)
        # Time-throttled epoch checkpoint (see train_shader for rationale).
        if time.time() - last_ckpt > cfg.checkpoint_secs:
            save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state))
            last_ckpt = time.time()
    save_checkpoint(ckpt_dir, jax.tree.map(np.asarray, state))
    save_params_npz(os.path.join(run.root, "params_final.npz"),
                    jax.tree.map(np.asarray, state.params))
    return state
