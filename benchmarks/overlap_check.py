"""Check the scaling model's overlap assumption against the REAL compiled
program: AOT-compile the data-parallel shader train step for a multi-chip
TPU topology (no hardware needed — jax.experimental.topologies) and read
what the compiler actually emits for the gradient all-reduce.

WHY: benchmarks/results/scaling_model_r3.json's ">85% at 2 hosts" claim
rested on the gradient all-reduce being fp32 (~1.66 GB) but OVERLAPPED
into backward compute — an unmeasured assumption, and the zero-overlap
patch-64 bound (80.5%) sat below the gate. This script replaces the
assumption with compiled evidence. Round-4 findings (recorded in
benchmarks/results/overlap_check_r4.json):

  * The gradient all-reduces are emitted in BF16, not fp32: with
    compute_dtype=bf16 the per-device gradients exist in bf16 before the
    cast-transpose back to fp32, and SPMD places the cross-device reduce
    on the bf16 values (every gradient all-reduce in the compiled module
    is bf16). The collective is therefore 2 bytes/param ≈ 0.47 GB — HALF
    the scaling model's fp32 assumption. The zero-overlap 2-host patch-64
    bound recomputed with bf16 bytes clears the gate WITHOUT any overlap:
    294 / (294 + 19) ≈ 94% (full-512: ≈ 98.5%).
  * The default v5e schedule emits SYNC ``all-reduce`` ops (no
    start/done pairs): the r3 "fully overlapped" scenario is NOT what the
    compiler schedules at this scale — the gate must rest on the bf16
    bound above, which it now does.
  * With scan_blocks the per-block wgrad all-reduces sit INSIDE the scan
    body (chunked through the backward), plus one fused tail all-reduce.
  * No compile configuration produced async pairs for the REAL step:
    latency-hiding-scheduler on (v5e + v5p) and SparseCore offload
    (v5p, ``xla_tpu_enable_sparse_core_collective_offload_all_reduce``)
    all leave the gradient all-reduces synchronous, although the SC
    option does async a toy DP matmul step — the in-scan-body chunked
    all-reduces are likely what blocks conversion. The scaling claim
    therefore rests on the measured bf16 bound above, which clears the
    gate with zero overlap on both steps.

Usage: python benchmarks/overlap_check.py [--patch 64] [--topology v5e:2x4]
       [--batch 24] [--try-options] [--dump FILE]
Runs on CPU (compile only; nothing executes).
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_DT_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "pred": 1, "u8": 1, "s8": 1, "f64": 8, "u64": 8, "s64": 8}
_TENSOR_RE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def _bytes_of_result(line: str, op: str) -> int:
    """Sum tensor bytes in the result type of `%x = TYPE op(...)`."""
    head = line.split(op + "(", 1)[0]
    head = head.split("=", 1)[-1]
    total = 0
    for dt, dims in _TENSOR_RE.findall(head):
        sz = _DT_BYTES.get(dt)
        if sz is None:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * sz
    return total


def analyze_schedule(text: str):
    """Per all-reduce: bytes, sync/async form, dtype mix, and (for async)
    how many convolution/fusion ops the schedule places between start and
    done. XLA:TPU is statically scheduled, so per-computation instruction
    order in the compiled module IS the schedule."""
    lines = text.splitlines()
    start_re = re.compile(r"%(\S+?)\s*=\s*.*\ball-reduce-start\(")
    done_re = re.compile(r"\ball-reduce-done\(")
    sync_re = re.compile(r"=\s*.*\ball-reduce\(")
    compute_re = re.compile(r"\b(convolution|fusion|dot)\b")
    results = []
    open_starts = []
    for i, ln in enumerate(lines):
        ms = start_re.search(ln)
        if ms:
            open_starts.append((ms.group(1), i))
            continue
        if done_re.search(ln):
            for j in range(len(open_starts) - 1, -1, -1):
                name, si = open_starts[j]
                if name in ln:
                    between = lines[si + 1 : i]
                    results.append({
                        "form": "async",
                        "bytes": _bytes_of_result(
                            lines[si], "all-reduce-start"
                        ),
                        "bf16": "bf16[" in lines[si],
                        "sched_ops_between": i - si - 1,
                        "compute_ops_between": sum(
                            1 for b in between if compute_re.search(b)
                        ),
                    })
                    open_starts.pop(j)
                    break
            continue
        if sync_re.search(ln) and "all-reduce-start" not in ln and (
            "all-reduce-done" not in ln
        ):
            results.append({
                "form": "sync",
                "bytes": _bytes_of_result(ln, "all-reduce"),
                "bf16": "bf16[" in ln,
                "in_loop_body": "while/body" in ln,
            })
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--patch", type=int, default=64)
    p.add_argument("--batch", type=int, default=24)
    p.add_argument("--topology", default="v5e:2x4")
    p.add_argument("--dump", default="", help="also write full HLO here")
    p.add_argument("--try-options", action="store_true",
                   help="also compile with LHS / SC-offload options")
    args = p.parse_args()

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.optim import make_optimizer
    from rendernet_tpu.train.steps import (
        create_shader_state,
        make_shader_train_step,
    )

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name=args.topology
    )
    n = len(topo.devices)
    mesh = Mesh(np.array(topo.devices).reshape(n), ("data",))

    cfg = TrainConfig(
        batch_size=args.batch, img_res=512, new_size=128,
        compute_dtype="bfloat16", is_greyscale=True, e_eta=1e-5,
    )
    # scan_blocks shrinks the unrolled program ~5x for the local AOT
    # compile; the gradient all-reduce structure is unchanged.
    model_cfg = ShaderConfig(scan_blocks=True, preact_policy=True)

    # shapes only — never allocates the 237 M params on host
    st = jax.eval_shape(
        lambda: create_shader_state(jax.random.PRNGKey(0), model_cfg, cfg)[0]
    )
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    st = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl), st
    )
    b = args.batch
    arg_sds = (
        st,
        jax.ShapeDtypeStruct((b, 64, 64, 64, 1), jnp.float32, sharding=data),
        jax.ShapeDtypeStruct((b, 512, 512, 1), jnp.float32, sharding=data),
        jax.ShapeDtypeStruct((b, 3), jnp.float32, sharding=data),
        jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl),
    )

    tx = make_optimizer(cfg.e_eta, cfg.decay_steps, cfg.decay_rate,
                        moment_dtype=cfg.moment_dtype)
    step = make_shader_train_step(model_cfg, cfg, tx, patch_size=args.patch)
    lowered = step.lower(*arg_sds)

    option_sets = {"default": None}
    if args.try_options:
        option_sets["lhs"] = {
            "xla_tpu_enable_latency_hiding_scheduler": "true"
        }
        if args.topology.startswith(("v5p", "v5:")):
            option_sets["sc_offload"] = {
                "xla_tpu_enable_sparse_core_collective_offload_all_reduce":
                    "true"
            }

    out = {
        "bench": "overlap_check",
        "topology": args.topology,
        "devices": n,
        "patch": args.patch,
        "batch": args.batch,
        "configs": {},
    }
    for name, opts in option_sets.items():
        compiled = (lowered.compile(compiler_options=opts) if opts
                    else lowered.compile())
        text = compiled.as_text()
        if args.dump and name == "default":
            with open(args.dump, "w") as f:
                f.write(text)
        ars = analyze_schedule(text)
        grad_ars = [a for a in ars if (a["bytes"] or 0) > 1 << 20]
        total = sum(a["bytes"] for a in grad_ars)
        out["configs"][name] = {
            "n_all_reduce": len(ars),
            "n_gradient_all_reduce": len(grad_ars),
            "n_async": sum(1 for a in grad_ars if a["form"] == "async"),
            "n_async_with_compute_between": sum(
                1 for a in grad_ars
                if a["form"] == "async" and a["compute_ops_between"] > 0
            ),
            "n_in_scan_body": sum(
                1 for a in grad_ars if a.get("in_loop_body")
            ),
            "all_bf16": all(a["bf16"] for a in grad_ars) if grad_ars else None,
            "grad_all_reduce_mbytes": round(total / 1e6, 1),
        }
        del compiled, text

    # The static text counts an in-scan-body all-reduce ONCE though it
    # executes once per scan iteration, so the parsed sum under-counts.
    # The right total for the comms bound is analytic: every parameter's
    # gradient is all-reduced exactly once per step, and the compiled
    # program reduces them in bf16 (all_bf16 above) — 2 bytes/param.
    n_params = sum(
        int(np.prod(x.shape)) for x in jax.tree.leaves(st.params)
    )
    grad_bytes = n_params * (
        2 if out["configs"]["default"]["all_bf16"] else 4
    )
    out["n_params"] = n_params
    out["grad_all_reduce_mbytes_analytic"] = round(grad_bytes / 1e6, 1)

    # Re-derive the 2-host zero-overlap bound with the bf16 bytes
    # (constants and method from benchmarks/scaling_model.py).
    meas = grad_bytes / 1e9  # GB
    dcn_gbps = 25.0
    ring = 2 * (2 - 1) / 2  # 2-host ring factor per scaling_model.py
    t_comm = meas * ring / dcn_gbps  # seconds
    for step_name, step_s in (("patch64", 0.294), ("full512", 1.264)):
        out[f"zero_overlap_eff_2host_{step_name}_measured_bytes"] = round(
            step_s / (step_s + t_comm), 4
        )
    out["t_comm_2host_dcn_ms_measured_bytes"] = round(t_comm * 1e3, 2)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
