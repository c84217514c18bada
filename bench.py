"""Benchmark: shader fwd+bwd training throughput (one JSON line).

Primary metric — the BASELINE.json north-star, measured at what the name
says: frames/s/chip for the TRUE full-resolution training step (patch 128
-> full 512x512 output, forward + backward through pose transform ->
trilinear resample -> shader RenderNet -> BCE loss -> grads -> Adam), bf16
compute, batch 24. The reference's full-res path is its validation/eval
graph (RenderNet_Shader.py:272-298).

``extras.patch64_curriculum_frames_per_s`` is the patch-64 curriculum
steady-state step (a 256x256 crop of the 512 target — what the reference
actually trains on after epoch 5, RenderNet_Shader.py:204-207); it was
round 1's headline number under a mislabeled 512px name.

The reference publishes no throughput numbers (BASELINE.md), so
``vs_baseline`` divides by a MEASURED denominator: the naive XLA port of
the reference graph (fp32, exact 8-gather trilinear resample, plain XLA
convs — ``benchmarks/naive_port_bench.py``) run on this same chip at the
same full-512 configuration, recorded in
``benchmarks/results/naive_port_r3.json``. That isolates exactly the
TPU-first engineering; see ``extras.baseline_note``.

Batch size auto-scales down if the device is small; values are normalized
to frames (samples)/s/chip regardless.
"""
from __future__ import annotations

import json
import time


def main() -> None:
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.steps import create_shader_state, make_shader_train_step

    n_chips = 1  # single-chip benchmark; multi-chip scaling measured separately
    # Experiment knobs (defaults = the recorded metric's configuration).
    env_batch = int(os.environ.get("RENDERNET_BENCH_BATCH", "24"))
    env_scan = bool(int(os.environ.get("RENDERNET_BENCH_SCAN", "0")))
    env_pallas2d = os.environ.get("RENDERNET_BENCH_PALLAS2D")
    if env_pallas2d is not None:
        from rendernet_tpu.nn import layers

        layers.PALLAS_CONV2D = bool(int(env_pallas2d))
    env_ph3d = os.environ.get("RENDERNET_BENCH_PHASE3D")
    if env_ph3d is not None:
        from rendernet_tpu.nn import layers

        # "0"/"1" = off / fan-in-gated; "all" = no fan-in gate (the
        # measured texture negative — layers.PHASE_CONV3D docs)
        layers.PHASE_CONV3D = (
            "all" if env_ph3d == "all" else bool(int(env_ph3d))
        )
    env_prelu_pre = os.environ.get("RENDERNET_BENCH_PRELU_PRE")
    if env_prelu_pre is not None:
        from rendernet_tpu.ops import pallas_conv2d

        pallas_conv2d.PRELU_SAVE_PRE = bool(int(env_prelu_pre))
    # Fused-Winograd res-stack convs ("pallas"|"xla"|"off"). The pallas
    # kernel measures 21.08 fps full-512 (vs 19.28 best XLA-conv config,
    # winograd_bench_r4.json) and PASSES the training-quality gate under
    # the fixed round-5 protocol (lr 2e-5 / 400 steps / liveness-asserted
    # arms): winograd-trained L1 0.0134 vs XLA-conv 0.0173 at identical
    # budget — ratio 0.77, slightly BETTER (winograd_quality_ab_r5.json;
    # the earlier lr-1e-4 "FAIL" was a dead-arm artifact, postmortem in
    # docs/performance.md). Default "pallas" per that artifact.
    env_wino = os.environ.get("RENDERNET_BENCH_WINOGRAD", "pallas")
    if env_wino not in ("pallas", "xla", "off"):
        raise SystemExit(
            f"RENDERNET_BENCH_WINOGRAD={env_wino!r}: must be one of "
            "'pallas' (fused kernel), 'xla' (measured-negative expression), "
            "'off' (plain XLA convs)"
        )
    if env_wino != "off":
        from rendernet_tpu.nn import layers

        layers.WINOGRAD_2D = env_wino
    # Transform-domain winograd WGRAD kernel (phase 2, opt-in): replaces
    # the backward's XLA conv wgrad with the fused 16-vs-36 MACs/tile
    # contraction where its tiling fits (ops/pallas_winograd.py).
    env_wgrad = os.environ.get("RENDERNET_BENCH_WINO_WGRAD", "0")
    if env_wgrad != "0":
        from rendernet_tpu.ops import pallas_winograd

        # "1" = bf16-operand GEMMs (fast, quality-FAILED); "fp32" =
        # precision=HIGHEST GEMMs (1.33x MAC cut, exact-grade numerics)
        pallas_winograd.WGRAD = "fp32" if env_wgrad == "fp32" else True

    rng = np.random.default_rng(0)

    env_accum = int(os.environ.get("RENDERNET_BENCH_ACCUM", "1"))

    def build(batch, patch, remat):
        cfg = TrainConfig(
            batch_size=batch,
            img_res=512,
            new_size=128,
            compute_dtype="bfloat16",
            is_greyscale=True,
            e_eta=1e-5,
            grad_accum_steps=env_accum,
            # bf16 moment storage: PASSED its quality gate under the fixed
            # round-5 protocol (ratio 0.82, both arms alive —
            # moments_quality_ab_r5.json; the r4 4.6x "FAIL" was a
            # dead-arm artifact). +0.15 fps and ~0.95 GB optimizer HBM.
            moment_dtype=os.environ.get(
                "RENDERNET_BENCH_MOMENT_DTYPE", "bfloat16"
            ),
        )
        model_cfg = ShaderConfig(
            remat=remat, scan_blocks=env_scan,
            remat_3d=bool(int(os.environ.get("RENDERNET_BENCH_REMAT3D", "0"))),
            # save-pre-activation res blocks (_act_conv custom VJP):
            # +3.2% at patch 64, free at full-512, exact math
            preact_policy=bool(
                int(os.environ.get("RENDERNET_BENCH_PREACT", "1"))
            ),
        )
        state, tx = create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)
        step = make_shader_train_step(model_cfg, cfg, tx, patch_size=patch)
        voxels = jnp.asarray(
            (rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32)
        )
        images = jnp.asarray(rng.random((batch, 512, 512, 1)).astype(np.float32))
        poses = jnp.asarray(
            np.stack(
                [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch),
                 np.ones(batch)],
                axis=1,
            ).astype(np.float32)
        )
        return step, state, (voxels, images, poses)

    key = jax.random.PRNGKey(1)

    def run(patch, batch):
        """frames/s at this patch size; falls back to remat, then smaller
        batches, on OOM. Returns (frames_per_s, batch_used, remat_used)."""
        # Opportunistic compile option: capping the TPU remat pass at the
        # full shared-memory limit measures +0.28 fps at full-512
        # (docs/performance.md round-4); harmless where accepted, and the
        # plain-jit path is the fallback if a compiler rejects it.
        copts = json.loads(os.environ.get(
            "RENDERNET_BENCH_COMPILER_OPTS",
            '{"xla_jf_rematerialization_percent_shared_memory_limit":"100"}',
        ) or "null")

        # winograd convs NEED the remat arm at full-512 (plain jit
        # exceeds HBM) — skip the known-failing compile instead of
        # paying it; patch-64 fits either way.
        # RENDERNET_BENCH_TRY_NOREMAT=1 re-enables the plain-jit arm for
        # winograd runs (e.g. with PREACT=1, whose ~6 GB res-stack
        # activation cut may make the no-remat winograd step fit).
        remat_ladder = (
            (True,)
            if env_wino != "off" and patch >= 128
            and not int(os.environ.get("RENDERNET_BENCH_TRY_NOREMAT", "0"))
            else (False, True)
        )
        while True:
            for remat in remat_ladder:
                try:
                    step, state, batch_data = build(batch, patch, remat)
                    if copts:
                        try:
                            step = step.lower(
                                state, *batch_data, key
                            ).compile(compiler_options=copts)
                        except Exception:
                            step, state, batch_data = build(
                                batch, patch, remat
                            )
                    state, loss = step(state, *batch_data, key)  # compile+warm
                    float(loss)
                    break
                except Exception:
                    if remat and batch <= 1:
                        raise
            else:
                batch //= 2
                continue
            break
        # Timed steps chain through the donated optimizer state; ONE host
        # fetch of the LAST loss forces the whole sequence (per-step syncs
        # cost a dispatch bubble each; block_until_ready on donated-aliased
        # scalars has returned early on the tunneled platform).
        n_steps = 8
        t0 = time.perf_counter()
        for _ in range(n_steps):
            state, loss = step(state, *batch_data, key)
        float(loss)
        dt = time.perf_counter() - t0
        del state, step, batch_data
        return batch * n_steps / dt / n_chips, batch, remat

    fps64, batch64, _ = run(64, env_batch)
    fps_full, batch_full, remat_full = run(128, env_batch)

    # Measured denominator: the naive XLA port of the reference graph at
    # the same full-512 configuration on this chip (fp32 + exact 8-gather
    # resample + plain XLA convs; benchmarks/naive_port_bench.py).
    naive_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "results", "naive_port_r3.json",
    )
    try:
        with open(naive_path) as f:
            naive = json.load(f)
        baseline = naive["full512"]["frames_per_s"]
        baseline_note = (
            "measured naive XLA port of the reference graph (fp32, exact "
            "8-gather resample, plain XLA convs) on this chip: "
            "%.4g frames/s full-512 (%s)"
            % (baseline, naive["date"])
        )
    except (OSError, KeyError, ValueError):
        baseline = 2.0
        baseline_note = (
            "naive-port record missing; 2.0 frames/s is an estimated "
            "budget for the reference's TF1.x single-GPU era"
        )
    print(
        json.dumps(
            {
                "metric": "shader_train_frames_per_s_per_chip_full512",
                "value": round(fps_full, 4),
                "unit": "frames/s/chip (fwd+bwd, full 512px step, batch %d, "
                        "bf16%s)" % (batch_full, ", remat" if remat_full else ""),
                "vs_baseline": round(fps_full / baseline, 4),
                "extras": {
                    "patch64_curriculum_frames_per_s": round(fps64, 4),
                    "patch64_batch": batch64,
                    "baseline_note": baseline_note,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
