"""Training-step tests: schedule parity, loss decrease, multi-chip sharding."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rendernet_tpu.models.shader import ShaderConfig
from rendernet_tpu.models.texture_face import TextureFaceConfig
from rendernet_tpu.train import (
    TrainConfig,
    create_shader_state,
    create_texture_state,
    exponential_staircase,
    make_mesh,
    make_shader_eval_step,
    make_shader_train_step,
    make_texture_train_step,
    replicate,
    shard_batch,
)

TINY = TrainConfig(
    batch_size=2,
    img_res=128,
    new_size=32,
    e_eta=1e-4,
    compute_dtype="float32",
    is_greyscale=True,
)
TINY_MODEL = ShaderConfig(new_size=32)


def _tiny_batch(rng, batch=2, img_channels=1):
    vox = (rng.random((batch, 16, 16, 16, 1)) > 0.7).astype(np.float32)
    images = rng.random((batch, 128, 128, img_channels)).astype(np.float32)
    poses = np.stack(
        [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch), np.ones(batch)],
        axis=1,
    ).astype(np.float32)
    return jnp.asarray(vox), jnp.asarray(images), jnp.asarray(poses)


def test_exponential_staircase_matches_tf_semantics():
    sched = exponential_staircase(1e-5, decay_steps=100, decay_rate=0.96)
    assert float(sched(0)) == pytest.approx(1e-5)
    assert float(sched(99)) == pytest.approx(1e-5)  # staircase: flat inside
    assert float(sched(100)) == pytest.approx(1e-5 * 0.96)
    assert float(sched(250)) == pytest.approx(1e-5 * 0.96**2)


def test_shader_train_step_decreases_loss(rng):
    state, tx = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
    # Full-size patch -> identity crop, so the loss sequence is
    # deterministic and must trend down.
    step = make_shader_train_step(TINY_MODEL, TINY, tx, patch_size=32)
    vox, images, poses = _tiny_batch(rng)
    # A learnable constant target (random-uniform targets are already
    # optimal for an untrained sigmoid head at p~0.5, so loss couldn't drop).
    images = jnp.full_like(images, 0.25)
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(8):
        state, loss = step(state, vox, images, poses, key)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(state.step) == 8


def test_shader_eval_step_full_resolution(rng):
    state, _ = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
    eval_step = make_shader_eval_step(TINY_MODEL, TINY)
    vox, _, poses = _tiny_batch(rng)
    pred = eval_step(state.params, vox, poses)
    assert pred.shape == (2, 128, 128, 1)


def test_shader_train_step_sharded_over_mesh(rng):
    """The same step runs with the batch sharded over an 8-device data mesh
    and produces the same loss as unsharded execution."""
    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    state, tx = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
    step = make_shader_train_step(TINY_MODEL, TINY, tx, patch_size=8)
    vox, images, poses = _tiny_batch(rng, batch=8)
    key = jax.random.PRNGKey(1)

    state_r = replicate(mesh, state)
    batch_sharded = shard_batch(mesh, (vox, images, poses))
    state_s, loss_sharded = step(state_r, *batch_sharded, key)

    state2, _ = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
    _, loss_local = step(state2, vox, images, poses, key)
    assert float(loss_sharded) == pytest.approx(float(loss_local), rel=1e-4)


def test_texture_train_step_smoke(rng):
    cfg = TrainConfig(
        batch_size=1, img_res=128, new_size=32, e_eta=1e-4,
        compute_dtype="float32", is_greyscale=False,
    )
    model_cfg = TextureFaceConfig(new_size=32)
    state, tx = create_texture_state(jax.random.PRNGKey(0), model_cfg, cfg)
    step = make_texture_train_step(model_cfg, cfg, tx, patch_size=32)
    vox = jnp.asarray((rng.random((1, 16, 16, 16, 1)) > 0.7).astype(np.float32))
    images = jnp.full((1, 128, 128, 3), 0.25, jnp.float32)
    normals = jnp.full((1, 128, 128, 3), 0.7, jnp.float32)
    textures = jnp.asarray(rng.standard_normal((1, 199)).astype(np.float32))
    poses = jnp.asarray([[0.5, 0.2, 1.0]], jnp.float32)
    key = jax.random.PRNGKey(2)
    losses = []
    for _ in range(6):
        state, loss = step(state, vox, images, normals, textures, poses, key)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_config_roundtrip(tmp_path):
    cfg = TrainConfig.from_json("/root/reference/config_RenderNet.json")
    assert cfg.batch_size == 1
    assert cfg.is_greyscale is True
    assert cfg.e_eta == pytest.approx(1e-5)
    assert cfg.decay_steps == 100000
    assert cfg.patch_size_for_epoch(0) == 32
    assert cfg.patch_size_for_epoch(5) == 64
    out = tmp_path / "snap.json"
    cfg.to_json(str(out))
    cfg2 = TrainConfig.from_json(str(out))
    assert cfg2 == cfg


def test_checkpoint_roundtrip_trainstate(tmp_path):
    from rendernet_tpu.train import restore_checkpoint, save_checkpoint

    state, _ = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, state)
    assert type(restored).__name__ == "TrainState"
    assert int(restored.step) == int(state.step)
    k = "encoder/e_conv1/e_conv1/weights"
    np.testing.assert_array_equal(
        np.asarray(state.params[k]), np.asarray(restored.params[k])
    )


def test_train_step_deterministic(rng):
    """Same state/batch/key -> identical loss (no hidden nondeterminism)."""
    vox, images, poses = _tiny_batch(rng)
    key = jax.random.PRNGKey(5)
    losses = []
    for _ in range(2):
        state, tx = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
        step = make_shader_train_step(TINY_MODEL, TINY, tx, patch_size=8)
        _, loss = step(state, vox, images, poses, key)
        losses.append(float(loss))
    assert losses[0] == losses[1]


def test_spatially_sharded_inference_matches_local(rng):
    """Sharding the camera grid's row axis over an 8-device 'model' mesh
    (XLA halo exchange through the conv stacks) must not change results."""
    from rendernet_tpu.models.shader import init_shader_params, shader_rendernet
    from rendernet_tpu.nn.layers import Module
    from rendernet_tpu.train.distributed import make_mesh, replicate, spatial_sharding

    cfg = TINY_MODEL
    params = init_shader_params(jax.random.PRNGKey(0), cfg)
    vox = jnp.asarray(rng.random((1, 32, 32, 32, 1)).astype(np.float32))
    mesh = make_mesh(n_data=1, n_model=8)

    def net(p, v):
        return shader_rendernet(Module(params=p), v, cfg)

    out_local = jax.jit(net)(params, vox)
    vox_sharded = jax.device_put(vox, spatial_sharding(mesh, 5, axis=1))
    out_sharded = jax.jit(net)(replicate(mesh, params), vox_sharded)
    np.testing.assert_allclose(
        np.asarray(out_sharded), np.asarray(out_local), atol=1e-5
    )


def test_hybrid_mesh_and_host_local_batch():
    """make_hybrid_mesh lays out all 8 CPU devices; shard_host_local_batch
    assembles a global batch-sharded array (single process: local=global)."""
    from rendernet_tpu.train.distributed import (
        make_hybrid_mesh,
        process_shard,
        shard_host_local_batch,
    )

    mesh = make_hybrid_mesh()
    assert mesh.devices.size == 8 and mesh.axis_names == ("data", "model")
    batch = (np.arange(16, dtype=np.float32).reshape(16, 1),)
    (arr,) = shard_host_local_batch(mesh, batch)
    assert arr.shape == (16, 1)
    np.testing.assert_array_equal(np.asarray(arr), batch[0])
    # 8 devices -> 8 shards of 2 rows each
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape == (2, 1)
    local_bs, pidx, pcount = process_shard(16)
    assert (local_bs, pidx, pcount) == (16, 0, 1)
    with pytest.raises(ValueError):
        process_shard(15) if pcount > 1 else (_ for _ in ()).throw(ValueError())


def test_initialize_multihost_noop_without_config(monkeypatch):
    from rendernet_tpu.train import distributed

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("COORDINATOR_ADDRESS", raising=False)
    assert distributed.initialize_multihost() is False


def test_data_loader_shard_striding(tmp_path):
    """Two shards partition the entries disjointly and cover everything."""
    from rendernet_tpu.data.synthetic import make_synthetic_shader_tar
    from rendernet_tpu.data.loaders import data_loader

    import os
    assets = "/root/reference/binvox"
    img_tar, model_dir = make_synthetic_shader_tar(
        str(tmp_path), [os.path.join(assets, "chair.binvox")] * 2,
        poses_deg=((30, 60), (120, 75), (250, 100), (10, 90)),
        img_res=128,
    )
    def names_for(shard):
        out = []
        for _, _, _, names in data_loader(
            img_tar, model_dir, batch_size=2, flatten=True,
            img_res=128, shard=shard,
        ):
            out += names
        return out

    all_names = names_for(None)
    n0, n1 = names_for((0, 2)), names_for((1, 2))
    # padding repeats entries at the tail; compare as sets
    assert set(n0) | set(n1) == set(all_names)
    assert set(n0).isdisjoint(set(n1)) or len(set(all_names)) < 8
    assert len(set(n0)) == 4 and len(set(n1)) == 4


def test_skip_nonfinite_updates_rejects_bad_step(rng):
    """Failure recovery (SURVEY.md §5 — reference has none): a step whose
    gradients are non-finite leaves params and inner Adam state untouched
    when skip_nonfinite_updates is on; a following good step applies and
    resets the counter."""
    import dataclasses

    cfg = dataclasses.replace(TINY, skip_nonfinite_updates=3)
    state, tx = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, cfg)
    step = make_shader_train_step(TINY_MODEL, cfg, tx, patch_size=32)
    vox, images, poses = _tiny_batch(rng)
    key = jax.random.PRNGKey(1)

    params_before = jax.tree.map(np.asarray, state.params)
    bad_images = images.at[0, 0, 0, 0].set(jnp.nan)
    state, loss = step(state, vox, bad_images, poses, key)
    assert not np.isfinite(float(loss))
    assert int(state.opt_state.notfinite_count) == 1
    assert int(state.step) == 1  # step counter still advances
    for k, v in state.params.items():
        np.testing.assert_array_equal(np.asarray(v), params_before[k], err_msg=k)

    state, loss = step(state, vox, jnp.full_like(images, 0.25), poses, key)
    assert np.isfinite(float(loss))
    assert int(state.opt_state.notfinite_count) == 0
    changed = any(
        not np.array_equal(np.asarray(v), params_before[k])
        for k, v in state.params.items()
    )
    assert changed


def test_guard_loss_halt_policies():
    """_guard_loss: halt immediately without skipping; with skipping, pass
    through below the consecutive limit and halt at it."""
    import dataclasses
    from types import SimpleNamespace

    from rendernet_tpu.train.loop import _guard_loss

    events = []
    run = SimpleNamespace(log=lambda **kw: events.append(kw))

    plain = TINY
    with pytest.raises(FloatingPointError):
        _guard_loss(plain, run, None, 5, 0, float("nan"))

    skip = dataclasses.replace(TINY, skip_nonfinite_updates=2)
    state = SimpleNamespace(
        opt_state=SimpleNamespace(notfinite_count=1, total_notfinite=1)
    )
    _guard_loss(skip, run, state, 6, 0, float("nan"))  # tolerated
    state = SimpleNamespace(
        opt_state=SimpleNamespace(notfinite_count=2, total_notfinite=2)
    )
    with pytest.raises(FloatingPointError):
        _guard_loss(skip, run, state, 7, 0, float("nan"))
    _guard_loss(skip, run, state, 8, 0, 1.25)  # finite loss: no fetch/halt
    assert [e["event"] for e in events] == [
        "non_finite_loss",
        "nonfinite_updates_rejected",
        "nonfinite_updates_rejected",
    ]


def test_halt_if_rejecting_catches_finite_loss_bad_grads():
    """The periodic check halts on persistent rejected updates even when
    the loss stays finite (grad-only non-finiteness)."""
    import dataclasses
    from types import SimpleNamespace

    from rendernet_tpu.train.loop import _halt_if_rejecting

    events = []
    run = SimpleNamespace(log=lambda **kw: events.append(kw))
    cfg = dataclasses.replace(TINY, skip_nonfinite_updates=3)
    ok = SimpleNamespace(opt_state=SimpleNamespace(notfinite_count=0,
                                                   total_notfinite=5))
    _halt_if_rejecting(cfg, run, ok, 10, 0)  # healthy: no log, no halt
    assert events == []
    warn = SimpleNamespace(opt_state=SimpleNamespace(notfinite_count=2,
                                                     total_notfinite=7))
    _halt_if_rejecting(cfg, run, warn, 11, 0)  # logged, below limit
    assert events[-1]["event"] == "nonfinite_updates_rejected"
    bad = SimpleNamespace(opt_state=SimpleNamespace(notfinite_count=3,
                                                    total_notfinite=8))
    with pytest.raises(FloatingPointError):
        _halt_if_rejecting(cfg, run, bad, 12, 0)


def test_texture_train_step_sharded_over_mesh(rng):
    """Texture/normal two-head workload: batch sharded over the 8-device
    data mesh matches unsharded execution (parity with the shader test —
    both training workloads must run multi-chip)."""
    from rendernet_tpu.train.steps import create_texture_state, make_texture_train_step

    cfg = TrainConfig(
        batch_size=8, img_res=128, new_size=32, e_eta=1e-4,
        compute_dtype="float32", is_greyscale=False,
    )
    model_cfg = TextureFaceConfig(new_size=32)
    mesh = make_mesh()
    state, tx = create_texture_state(jax.random.PRNGKey(0), model_cfg, cfg)
    step = make_texture_train_step(model_cfg, cfg, tx, patch_size=32)

    vox = jnp.asarray((rng.random((8, 16, 16, 16, 1)) > 0.7).astype(np.float32))
    images = jnp.asarray(rng.random((8, 128, 128, 3)).astype(np.float32))
    normals = jnp.asarray(rng.random((8, 128, 128, 3)).astype(np.float32))
    textures = jnp.asarray(rng.standard_normal((8, 199)).astype(np.float32))
    poses = jnp.asarray(
        np.stack([rng.uniform(0, 6.28, 8), rng.uniform(-1, 1, 8), np.ones(8)],
                 axis=1).astype(np.float32)
    )
    key = jax.random.PRNGKey(3)

    state_r = replicate(mesh, state)
    sharded = shard_batch(mesh, (vox, images, normals, textures, poses))
    _, loss_sharded = step(state_r, *sharded, key)

    state2, _ = create_texture_state(jax.random.PRNGKey(0), model_cfg, cfg)
    _, loss_local = step(state2, vox, images, normals, textures, poses, key)
    assert float(loss_sharded) == pytest.approx(float(loss_local), rel=1e-4)


def test_pipelined_guard_delays_one_step_and_flushes():
    """_PipelinedGuard checks step n-1's loss when step n is pushed (no
    same-step sync) and flushes the final pending loss at loop exit."""
    import dataclasses
    from types import SimpleNamespace

    from rendernet_tpu.train.loop import _PipelinedGuard

    events = []
    run = SimpleNamespace(log=lambda **kw: events.append(kw))
    guard = _PipelinedGuard(TINY, run)
    state = SimpleNamespace(opt_state=None)

    guard.push(jnp.asarray(1.0), state, 1, 0)  # nothing checked yet
    guard.push(jnp.asarray(float("nan")), state, 2, 0)  # checks step 1: ok
    with pytest.raises(FloatingPointError, match="step 2"):
        guard.push(jnp.asarray(0.5), state, 3, 0)  # checks step 2: NaN

    guard2 = _PipelinedGuard(TINY, run)
    guard2.push(jnp.asarray(float("nan")), state, 7, 1)
    with pytest.raises(FloatingPointError, match="step 7"):
        guard2.flush(state)  # tail loss still checked at exit
    guard2.flush(state)  # idempotent once drained


def test_spatially_sharded_training_matches_local(rng):
    """A full TRAIN step with batch over 'data' AND voxel/image rows over
    'model' (dp+sp — XLA halo exchanges through resample, crop, convs and
    their gradients) reproduces the local loss."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from rendernet_tpu.train.distributed import make_mesh, replicate

    vox, images, poses = _tiny_batch(rng)
    key = jax.random.PRNGKey(1)
    state, tx = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
    step = make_shader_train_step(TINY_MODEL, TINY, tx, patch_size=32)
    _, loss_local = step(state, vox, images, poses, key)

    mesh = make_mesh(n_data=2, n_model=4)
    state2, _ = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
    state2 = replicate(mesh, state2)
    vox_s = jax.device_put(vox, NamedSharding(mesh, P("data", "model")))
    img_s = jax.device_put(images, NamedSharding(mesh, P("data", "model")))
    poses_s = jax.device_put(poses, NamedSharding(mesh, P("data")))
    _, loss_sp = step(state2, vox_s, img_s, poses_s, key)
    assert float(loss_sp) == pytest.approx(float(loss_local), rel=1e-5)


def test_restore_checkpoint_reads_multihost_flat_form(tmp_path):
    """restore_checkpoint prefers the multi-host flat .npz form (written by
    the chief; Orbax's barriers can't be used chief-only)."""
    import numpy as np

    from rendernet_tpu.train import restore_checkpoint

    state, _ = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, TINY)
    leaves = jax.tree.leaves(state)
    path = str(tmp_path / "ckpt")
    np.savez(path + ".npz",
             **{str(i): np.asarray(l) for i, l in enumerate(leaves)})
    restored = restore_checkpoint(path, state)
    assert type(restored).__name__ == "TrainState"
    k = "encoder/e_conv1/e_conv1/weights"
    np.testing.assert_array_equal(
        np.asarray(state.params[k]), np.asarray(restored.params[k])
    )


def test_grad_accumulation_matches_full_batch(rng):
    """Accumulated loss/gradients equal the full-batch ones. Exactness is
    asserted in float64 (in fp32 the per-microbatch partial sums quantize
    before averaging — inherent to any gradient accumulation — so the fp32
    check is the end-to-end loss trajectory).

    Uses a SHALLOW model (2/2/1 res blocks): accumulation happens outside
    the network, so depth adds nothing to the property under test — the
    full-depth variant proved the same thing in 384 s of x64 compile."""
    import dataclasses

    from rendernet_tpu.models.shader import shader_rendernet
    from rendernet_tpu.nn.layers import Module
    from rendernet_tpu.ops.resample import rotate_resample_to_camera
    from rendernet_tpu.train.steps import (
        _accumulated_value_and_grad,
        shader_loss_from_images,
    )

    shallow = dataclasses.replace(
        TINY_MODEL, res1_blocks=2, res2_blocks=2, res3_blocks=1, new_size=16
    )
    vox, images, poses = _tiny_batch(rng, batch=4)
    vox = vox[:, ::2, ::2, ::2]  # 8^3 voxels -> 16-deep camera grid
    images = jnp.full_like(images[:, ::2, ::2], 0.25)  # 64px target
    key = jax.random.PRNGKey(9)
    cfg = dataclasses.replace(TINY, batch_size=4, img_res=64, new_size=16)
    state, _ = create_shader_state(jax.random.PRNGKey(0), shallow, cfg)

    jax.config.update("jax_enable_x64", True)
    try:
        p64 = jax.tree.map(lambda p: jnp.asarray(np.asarray(p), jnp.float64),
                           state.params)
        v64 = vox.astype(jnp.float64)
        i64 = images.astype(jnp.float64)
        q64 = poses.astype(jnp.float64)

        def loss_fn(params, v, i, q):
            cam = rotate_resample_to_camera(v, q, new_size=cfg.new_size)
            pred = shader_rendernet(
                Module(params=params, compute_dtype=jnp.float64), cam,
                shallow,
            )
            return jnp.mean(
                -jnp.sum(
                    i * jnp.log(1e-6 + pred)
                    + (1.0 - i) * jnp.log(1e-6 + 1.0 - pred),
                    axis=(1, 2, 3),
                )
            )

        # Compare both under jit (eager vs compiled differ by XLA
        # reassociation; accumulation itself is exact).
        lf, gf = jax.jit(jax.value_and_grad(loss_fn))(p64, v64, i64, q64)
        la, ga = jax.jit(
            lambda p, v, i, q: _accumulated_value_and_grad(
                loss_fn, p, (v, i, q), 2
            )
        )(p64, v64, i64, q64)
        assert float(la) == pytest.approx(float(lf), rel=1e-10)
        for k in gf:
            scale = max(1e-12, float(np.abs(np.asarray(gf[k])).max()))
            np.testing.assert_allclose(
                np.asarray(ga[k]) / scale, np.asarray(gf[k]) / scale,
                atol=1e-9, err_msg=k,
            )
    finally:
        jax.config.update("jax_enable_x64", False)

    # fp32 end-to-end: the jitted accumulating step tracks the full-batch
    # loss trajectory over several Adam steps.
    cfg2 = dataclasses.replace(cfg, grad_accum_steps=2)
    state2, tx2 = create_shader_state(jax.random.PRNGKey(0), shallow, cfg2)
    step2 = make_shader_train_step(shallow, cfg2, tx2, patch_size=16)
    state1, tx1 = create_shader_state(jax.random.PRNGKey(0), shallow, cfg)
    step1 = make_shader_train_step(shallow, cfg, tx1, patch_size=16)
    for _ in range(3):
        state1, loss1 = step1(state1, vox, images, poses, key)
        state2, loss2 = step2(state2, vox, images, poses, key)
        assert float(loss2) == pytest.approx(float(loss1), rel=1e-4)


def test_grad_accumulation_validates_divisibility(rng):
    import dataclasses

    cfg = dataclasses.replace(TINY, batch_size=3, grad_accum_steps=2)
    state, tx = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, cfg)
    step = make_shader_train_step(TINY_MODEL, cfg, tx, patch_size=32)
    vox, images, poses = _tiny_batch(rng, batch=3)
    with pytest.raises(ValueError, match="divisible"):
        step(state, vox, images, poses, jax.random.PRNGKey(0))


def test_preact_policy_preserves_step_semantics(rng):
    """save-pre-activations-only remat (ShaderConfig.preact_policy) is a
    pure memory transform: identical forward loss and fp32-roundoff-equal
    gradients, for both the unrolled and lax.scan stack forms. (Gradients,
    not post-Adam params: Adam normalizes magnitude away, so roundoff-level
    grad wobble would look large through it.)"""
    from rendernet_tpu.models.shader import init_shader_params, shader_rendernet
    from rendernet_tpu.nn.layers import Module

    # camera-aligned input: depth must equal new_size (no resample here)
    vox = jnp.asarray(
        (rng.random((2, 8, 8, 32, 1)) > 0.7).astype(np.float32)
    )
    params = init_shader_params(jax.random.PRNGKey(0), ShaderConfig(new_size=32))

    def vg(model_cfg):
        def loss(p):
            m = Module(params=p)
            return jnp.mean(shader_rendernet(m, vox, model_cfg) ** 2)

        return jax.jit(jax.value_and_grad(loss))(params)

    base_loss, base_grads = vg(ShaderConfig(new_size=32))
    for extra in ({"scan_blocks": False}, {"scan_blocks": True}):
        loss, grads = vg(
            ShaderConfig(new_size=32, preact_policy=True, **extra)
        )
        assert float(loss) == pytest.approx(float(base_loss), rel=1e-7)
        for k in base_grads:
            np.testing.assert_allclose(
                np.asarray(grads[k]), np.asarray(base_grads[k]),
                rtol=1e-5, atol=1e-6, err_msg=k,
            )


def test_adam_moments_fp32_matches_optax_and_bf16_stays_close():
    """train.optim.scale_by_adam_moments: with moment_dtype=None the update
    rule is exactly optax's; with bf16 moments the state halves and a short
    trajectory stays within the expected storage-rounding envelope."""
    import optax

    from rendernet_tpu.train.optim import make_optimizer, scale_by_adam_moments

    params = {
        "a": jnp.asarray(np.random.default_rng(0).normal(size=(64,)),
                         jnp.float32),
        "w": jnp.asarray(np.random.default_rng(1).normal(size=(8, 8)),
                         jnp.float32),
    }
    gfn = jax.grad(lambda p: jnp.sum(jnp.sin(p["a"])) + jnp.sum(p["w"] ** 2))

    def trajectory(tx, n=10):
        s, p = tx.init(params), params
        for _ in range(n):
            u, s = tx.update(gfn(p), s, p)
            p = optax.apply_updates(p, u)
        return p, s

    ref = optax.chain(optax.scale_by_adam(b1=0.5, b2=0.999, eps=1e-8),
                      optax.scale_by_learning_rate(1e-3))
    new = optax.chain(scale_by_adam_moments(b1=0.5, b2=0.999, eps=1e-8),
                      optax.scale_by_learning_rate(1e-3))
    p_ref, _ = trajectory(ref)
    p_new, _ = trajectory(new)
    for k in params:
        np.testing.assert_allclose(np.asarray(p_ref[k]), np.asarray(p_new[k]),
                                   rtol=1e-7, atol=1e-7)

    tx_bf = make_optimizer(1e-3, 1000, moment_dtype="bfloat16")
    p_bf, s_bf = trajectory(tx_bf, n=20)
    float_leaves = [l for l in jax.tree.leaves(s_bf)
                    if l.dtype != jnp.int32]
    assert float_leaves and all(l.dtype == jnp.bfloat16 for l in float_leaves)
    tx_f = make_optimizer(1e-3, 1000)
    p_f, _ = trajectory(tx_f, n=20)
    # total parameter movement is ~lr*steps = 2e-2; bf16 moment storage
    # rounding perturbs the path by <1% of that
    for k in params:
        dev = float(jnp.max(jnp.abs(p_f[k] - p_bf[k])))
        assert dev < 2e-4, (k, dev)


def test_moment_dtype_validation():
    with pytest.raises(ValueError, match="moment_dtype"):
        TrainConfig(batch_size=1, img_res=128, new_size=32,
                    moment_dtype="float16").validate()


def test_bf16_allreduce_step_matches_fp32_path(rng):
    """cfg.allreduce_dtype='bfloat16' (shard_map + bf16 pmean of grads,
    train/steps.py) reproduces the XLA-propagation fp32 path: identical
    loss (computed in fp32) and post-step params within the bf16 gradient
    rounding envelope."""
    import dataclasses

    cfg = dataclasses.replace(TINY, batch_size=8)
    mesh = make_mesh()
    vox, images, poses = _tiny_batch(rng, batch=8)
    images = jnp.full_like(images, 0.25)
    key = jax.random.PRNGKey(5)

    state, tx = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, cfg)
    step = make_shader_train_step(TINY_MODEL, cfg, tx, patch_size=32)
    state_f, loss_f = step(state, vox, images, poses, key)

    cfg_bf = dataclasses.replace(cfg, allreduce_dtype="bfloat16")
    state2, tx2 = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, cfg_bf)
    step_bf = make_shader_train_step(
        TINY_MODEL, cfg_bf, tx2, patch_size=32, mesh=mesh
    )
    state2 = replicate(mesh, state2)
    sharded = shard_batch(mesh, (vox, images, poses))
    state_b, loss_b = step_bf(state2, *sharded, key)

    # loss is fp32 on both paths — tight
    assert float(loss_b) == pytest.approx(float(loss_f), rel=1e-5)
    # params went through one Adam step on bf16-rounded vs fp32 grads.
    # Adam's first step is lr * g/|g| (i.e. +-lr regardless of |g|), so a
    # near-zero grad element whose SIGN flips under bf16 rounding moves by
    # up to 2*lr — the exact bound for one step, not a loose tolerance.
    lr = cfg.e_eta
    for k in state_f.params:
        dev = float(jnp.max(jnp.abs(state_f.params[k] - state_b.params[k])))
        assert dev <= 2 * lr, (k, dev)


def test_texture_fused_resample_matches_two_pass(rng):
    """When voxel and texture grids share a resolution, the texture train
    step resamples ONE channel-concatenated grid (train/steps.py). The
    warp is linear and per-channel, so the loss must equal the manual
    two-pass construction exactly."""
    import dataclasses

    from rendernet_tpu.models.texture_face import (
        texture_decoder,
        texture_face_rendernet,
    )
    from rendernet_tpu.nn.layers import Module
    from rendernet_tpu.train.steps import (
        _resample_full,
        create_texture_state,
        make_texture_train_step,
        shader_loss_from_images,
    )

    cfg = TrainConfig(
        batch_size=2, img_res=128, new_size=32, e_eta=1e-4,
        compute_dtype="float32", is_greyscale=False,
    )
    # tex_grid == voxel_res == 16 -> the fused branch is taken
    model_cfg = TextureFaceConfig(new_size=32, tex_base=8, tex_grid=16)
    state, tx = create_texture_state(jax.random.PRNGKey(0), model_cfg, cfg)
    step = make_texture_train_step(model_cfg, cfg, tx, patch_size=32)

    vox = jnp.asarray((rng.random((2, 16, 16, 16, 1)) > 0.7).astype(np.float32))
    images = jnp.asarray(rng.random((2, 128, 128, 3)).astype(np.float32))
    normals = jnp.asarray(rng.random((2, 128, 128, 3)).astype(np.float32))
    textures = jnp.asarray(rng.standard_normal((2, 199)).astype(np.float32))
    poses = jnp.asarray(
        np.stack([rng.uniform(0, 6.28, 2), rng.uniform(-1, 1, 2),
                  np.ones(2)], axis=1).astype(np.float32)
    )
    key = jax.random.PRNGKey(7)
    # snapshot first: the jitted step DONATES its state
    params = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)), state.params)
    _, loss_fused = step(state, vox, images, normals, textures, poses, key)

    # manual two-pass construction with the same params
    m = Module(params=params, compute_dtype=jnp.float32, train=True,
               dropout_rng=jax.random.PRNGKey(0))
    tex_grid = texture_decoder(m, textures, tex_base=8, tex_grid=16)
    vox_c = _resample_full(vox, poses, cfg)
    tex_c = _resample_full(tex_grid.astype(jnp.float32), poses, cfg)
    both = jnp.concatenate([vox_c, tex_c], axis=4)
    albedo, normal_pred = texture_face_rendernet(m, both, model_cfg)
    loss_manual = shader_loss_from_images(
        albedo, images, greyscale=False
    ) + shader_loss_from_images(normal_pred, normals, greyscale=False)
    assert float(loss_fused) == pytest.approx(float(loss_manual), rel=1e-6)


def test_bf16_moments_checkpoint_roundtrip(tmp_path):
    """The bf16-moment optimizer state (AdamMomentState) survives the
    Orbax checkpoint round-trip with dtypes intact."""
    import dataclasses

    from rendernet_tpu.train import restore_checkpoint, save_checkpoint

    cfg = dataclasses.replace(TINY, moment_dtype="bfloat16")
    state, _ = create_shader_state(jax.random.PRNGKey(0), TINY_MODEL, cfg)
    path = str(tmp_path / "ckpt_bf16")
    save_checkpoint(path, state)
    restored = restore_checkpoint(path, state)
    float_leaves = [l for l in jax.tree.leaves(restored.opt_state)
                    if hasattr(l, "dtype") and l.dtype != jnp.int32]
    assert float_leaves and all(l.dtype == jnp.bfloat16 for l in float_leaves)
