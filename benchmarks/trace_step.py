"""Capture + summarize an XLA-op-level profile of a train step
(shader or texture workload).

Writes a jax.profiler trace of N steps, then parses the trace-events dump
directly (no TensorBoard UI needed) and prints (a) the per-call-duration
BAND table used by docs/performance.md's decompositions and (b) the top
device ops by total self time — the ground truth for where the step's
roofline gap lives. (Round 1's attribution came from a benchmark XLA had
partially dead-code-eliminated; this replaces it.)

Usage: python benchmarks/trace_step.py [--workload shader|texture]
       [--patch 64] [--remat] [--preact] [--out /tmp/trace]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(out_dir: str, patch: int, batch: int, steps: int,
            workload: str = "shader", remat: bool = False,
            preact: bool = False) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from rendernet_tpu.train.config import TrainConfig

    rng = np.random.default_rng(0)
    voxels = jnp.asarray((rng.random((batch, 64, 64, 64, 1)) > 0.7).astype(np.float32))
    poses = jnp.asarray(np.stack(
        [rng.uniform(0, 6.28, batch), rng.uniform(-1, 1, batch), np.ones(batch)],
        axis=1).astype(np.float32))
    key = jax.random.PRNGKey(1)

    if workload == "shader":
        from rendernet_tpu.models.shader import ShaderConfig
        from rendernet_tpu.train.steps import (
            create_shader_state,
            make_shader_train_step,
        )

        cfg = TrainConfig(batch_size=batch, img_res=512, new_size=128,
                          compute_dtype="bfloat16", is_greyscale=True,
                          e_eta=1e-5)
        model_cfg = ShaderConfig(remat=remat, preact_policy=preact)
        state, tx = create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)
        step = make_shader_train_step(model_cfg, cfg, tx, patch_size=patch)
        images = jnp.asarray(
            rng.random((batch, 512, 512, 1)).astype(np.float32))
        batch_args = (voxels, images, poses)
    else:
        from rendernet_tpu.models.texture_face import TextureFaceConfig
        from rendernet_tpu.train.steps import (
            create_texture_state,
            make_texture_train_step,
        )

        cfg = TrainConfig(batch_size=batch, img_res=512, new_size=128,
                          compute_dtype="bfloat16", is_greyscale=False,
                          e_eta=1e-5)
        model_cfg = TextureFaceConfig(remat=remat, preact_policy=preact)
        state, tx = create_texture_state(jax.random.PRNGKey(0), model_cfg, cfg)
        step = make_texture_train_step(model_cfg, cfg, tx, patch_size=patch)
        images = jnp.asarray(
            rng.random((batch, 512, 512, 3)).astype(np.float32))
        normals = jnp.asarray(
            rng.random((batch, 512, 512, 3)).astype(np.float32))
        textures = jnp.asarray(
            rng.standard_normal((batch, 199)).astype(np.float32))
        batch_args = (voxels, images, normals, textures, poses)

    state, loss = step(state, *batch_args, key)
    state, loss = step(state, *batch_args, key)
    float(loss)
    jax.profiler.start_trace(out_dir)
    for _ in range(steps):
        state, loss = step(state, *batch_args, key)
    float(loss)
    jax.profiler.stop_trace()


def summarize_by_category(out_dir: str, steps: int) -> None:
    """Group device self-time by hlo_category with source attribution for
    the Pallas custom-calls (whose names — e.g. ``transpose_jvp___.N`` —
    look like transposes but are kernels named after their autodiff
    scope; round 3 misread them as XLA layout transposes). This is the
    view behind docs/performance.md's per-category tables."""
    import collections
    import re

    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print(json.dumps({"error": "no trace.json.gz found", "dir": out_dir}))
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    skip = re.compile(r"^(jit_|\d+$|\$)")
    cat = collections.Counter()
    for e in trace.get("traceEvents", []):
        if e.get("ph") != "X":
            continue
        n = e.get("name", "")
        if skip.match(n) or "asarray" in n or "stop_trace" in n:
            continue
        a = e.get("args") or {}
        c = a.get("hlo_category")
        if c is None:
            continue  # host-side / container spans
        src = a.get("source", "")
        if "pallas_conv3d" in src or "pallas_conv2d" in src or (
            "layers.py" in src and "custom" in c
        ):
            c = "pallas conv kernels"
        elif "pallas_resample" in src:
            c = "pallas resample kernels"
        if ".remat" in n and not c.startswith("pallas"):
            c += " [remat]"
        cat[c] += e.get("dur", 0)
    total = sum(cat.values())
    print(json.dumps({"device_total_ms_per_step":
                      round(total / 1000 / steps, 1)}))
    for k, v in cat.most_common():
        print(json.dumps({
            "category": k,
            "ms_per_step": round(v / 1000 / steps, 1),
            "pct": round(100 * v / max(total, 1), 1),
        }))


def summarize(out_dir: str, steps: int, top: int = 40) -> None:
    """Aggregate device-plane op self-times from the trace-events JSON (the
    perfetto dump jax writes next to the xplane pb)."""
    paths = sorted(glob.glob(os.path.join(
        out_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        print(json.dumps({"error": "no trace.json.gz found", "dir": out_dir}))
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device PIDs: process_name metadata containing "TPU" / "device"
    device_pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if "TPU" in name or "/device" in name.lower():
                device_pids.add(e.get("pid"))
    tot = collections.Counter()
    cnt = collections.Counter()
    import re as _re

    container = _re.compile(r"^(jit_\w*\(|\d+$)")  # program/step spans
    for e in events:
        name = e.get("name", "?")
        if (e.get("ph") == "X" and e.get("pid") in device_pids
                and not container.match(name)):
            tot[name] += e.get("dur", 0)
            cnt[name] += 1
    total_us = sum(tot.values())
    print(json.dumps({"device_total_ms_per_step":
                      round(total_us / 1000 / steps, 3)}))
    # per-call-duration bands (the docs/performance.md decomposition view)
    bands = [(8000, ">=8ms"), (2000, "2-8ms"), (500, "0.5-2ms"),
             (0, "<0.5ms")]
    band_tot = collections.Counter()
    band_ops = collections.Counter()
    for name, us in tot.items():
        per_call = us / max(cnt[name], 1)
        for floor, label in bands:
            if per_call >= floor:
                band_tot[label] += us
                band_ops[label] += cnt[name]
                break
    for _, label in bands:
        print(json.dumps({
            "band": label,
            "ms_per_step": round(band_tot[label] / 1000 / steps, 1),
            "calls_per_step": band_ops[label] // steps,
        }))
    for name, us in tot.most_common(top):
        print(json.dumps({
            "op": name[:120],
            "ms_per_step": round(us / 1000 / steps, 3),
            "calls_per_step": cnt[name] // steps,
            "pct": round(100 * us / max(total_us, 1), 2),
        }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="shader",
                    choices=["shader", "texture"])
    ap.add_argument("--patch", type=int, default=64)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--preact", action="store_true")
    ap.add_argument("--out", type=str, default="/tmp/trace_step")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--by-category", action="store_true")
    a = ap.parse_args()
    if not a.summarize_only:
        capture(a.out, a.patch, a.batch, a.steps, a.workload, a.remat,
                a.preact)
    if a.by_category:
        summarize_by_category(a.out, a.steps)
    summarize(a.out, a.steps)
