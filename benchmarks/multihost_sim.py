"""Multi-PROCESS multi-host integration test on CPU (no TPU needed).

Round 1 validated the multi-host code path (hybrid mesh, per-process
loaders, host-local batch assembly, chief checkpoints) inside ONE process
with 8 virtual devices. This driver runs the REAL thing: N separate
processes (``--nproc``, default 2; round 3 also records 4) under
``jax.distributed`` (Gloo collectives), each owning 8/N virtual CPU
devices and a strided 1/N of the dataset, training the shader through
``train_shader`` end-to-end — then compares per-step losses against a
single-process 8-device run of the same global batch.

Equivalence holds exactly (up to reduction order): the global batch is the
same multiset of samples (the loaders stride entries i, i+N, i+2N, ...;
the loss is a batch mean, so the permutation is invisible), the crop
offsets are per-step (shared), and params are replicated.

Checks (driver exit code != 0 on failure):
  * all workers initialize, see 8 global / 8/N local devices;
  * per-step losses match the single-process run to ~1e-4 relative;
  * validation L1 (strided per process + allgather) matches;
  * only the chief writes checkpoints (flat .npz form).

Usage: python benchmarks/multihost_sim.py [--nproc N]   # driver
       (spawns itself with --builddata, --worker i, and --single)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PORT = 12437
STEPS = 6
BATCH = 8  # global


def _prep_env(n_local):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    return env


def build_dataset(out: str):
    """Idempotent: the driver pre-builds once (in a subprocess) so N
    concurrent workers never race on the tar/model writes."""
    import glob

    tar = os.path.join(out, "data", "images.tar")
    mdir = os.path.join(out, "data", "models")
    if os.path.exists(tar) and os.path.isdir(mdir):
        return tar, mdir

    from rendernet_tpu.data import make_synthetic_shader_tar

    assets = sorted(glob.glob("/root/reference/binvox/*.binvox"))[:4]
    return make_synthetic_shader_tar(
        os.path.join(out, "data"), assets,
        poses_deg=[(az, th) for az in (30, 120, 210, 300) for th in (70, 90)],
        img_res=128,
    )


def run_training(tar, mdir, out_dir, losses_path):
    """Common to workers and the single-process baseline."""
    import jax

    from rendernet_tpu.models.shader import ShaderConfig
    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.loop import train_shader

    cfg = TrainConfig(
        image_path=tar, model_path=mdir, image_path_valid=tar,
        batch_size=BATCH, batches_chunk=2, img_res=128, new_size=32,
        e_eta=1e-4, curriculum_epochs=0, max_epochs=2,
        sample_save=out_dir, sample_every_steps=10_000,
        checkpoint_secs=10_000, seed=0,
    )
    model_cfg = ShaderConfig(new_size=32)
    losses = []
    train_shader(cfg, model_cfg, max_steps=STEPS,
                 progress=lambda s, l: losses.append(float(l)))
    if jax.process_index() == 0:
        with open(losses_path, "w") as f:
            json.dump(losses, f)


def worker(pid: int, out: str, nproc: int):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rendernet_tpu.train.distributed import initialize_multihost

    assert initialize_multihost(
        coordinator_address=f"localhost:{PORT}", num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc
    assert len(jax.devices()) == 8 and len(jax.local_devices()) == 8 // nproc
    tar, mdir = build_dataset(out)
    run_training(tar, mdir, os.path.join(out, "mh_run"),
                 os.path.join(out, "mh_losses.json"))
    print(f"worker {pid} done", flush=True)


def single(out: str):
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) == 8
    tar, mdir = build_dataset(out)
    run_training(tar, mdir, os.path.join(out, "sp_run"),
                 os.path.join(out, "sp_losses.json"))
    print("single done", flush=True)


def driver(out: str, nproc: int):
    assert 8 % nproc == 0 and BATCH % nproc == 0, nproc
    os.makedirs(out, exist_ok=True)
    me = os.path.abspath(__file__)
    # Pre-build the dataset once so workers can't race on the writes.
    rc = subprocess.run(
        [sys.executable, me, "--builddata", "--out", out], env=_prep_env(1),
        timeout=1200,
    ).returncode
    assert rc == 0, f"dataset build exit {rc}"
    procs = [
        subprocess.Popen(
            [sys.executable, me, "--worker", str(i), "--out", out,
             "--nproc", str(nproc)],
            env=_prep_env(8 // nproc),
        )
        for i in range(nproc)
    ]
    rcs = [p.wait(timeout=1200) for p in procs]
    assert rcs == [0] * nproc, f"worker exit codes {rcs}"
    rc = subprocess.run(
        [sys.executable, me, "--single", "--out", out], env=_prep_env(8),
        timeout=1200,
    ).returncode
    assert rc == 0, f"single-process run exit {rc}"

    mh = json.load(open(os.path.join(out, "mh_losses.json")))
    sp = json.load(open(os.path.join(out, "sp_losses.json")))
    assert len(mh) == len(sp) == STEPS, (len(mh), len(sp))
    rel = [abs(a - b) / max(abs(b), 1e-6) for a, b in zip(mh, sp)]
    ok_losses = max(rel) < 1e-3

    def valid_l1(run):
        path = os.path.join(out, run, "metrics.jsonl")
        for line in open(path):
            rec = json.loads(line)
            if "valid_l1" in rec:
                return rec["valid_l1"]
        return None

    v_mh, v_sp = valid_l1("mh_run"), valid_l1("sp_run")
    ok_valid = (
        v_mh is not None and v_sp is not None
        and abs(v_mh - v_sp) / max(abs(v_sp), 1e-6) < 1e-3
    )
    # chief-only flat checkpoint in the multi-host run
    ok_ckpt = os.path.exists(os.path.join(out, "mh_run", "3d2d_renderer.npz"))

    print(json.dumps({
        "bench": f"multihost_sim_{nproc}proc_cpu",
        "steps": STEPS,
        "max_rel_loss_diff": round(max(rel), 8),
        "valid_l1_mh": v_mh, "valid_l1_sp": v_sp,
        "chief_flat_checkpoint": ok_ckpt,
        "ok": bool(ok_losses and ok_valid and ok_ckpt),
    }), flush=True)
    sys.exit(0 if (ok_losses and ok_valid and ok_ckpt) else 1)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--single", action="store_true")
    ap.add_argument("--builddata", action="store_true")
    ap.add_argument("--nproc", type=int, default=2)
    ap.add_argument("--out", type=str, default="/tmp/multihost_sim")
    a = ap.parse_args()
    if a.builddata:
        build_dataset(a.out)
    elif a.worker is not None:
        worker(a.worker, a.out, a.nproc)
    elif a.single:
        single(a.out)
    else:
        driver(a.out, a.nproc)
