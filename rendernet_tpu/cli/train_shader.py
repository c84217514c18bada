"""Shader-workload trainer CLI: ``python -m rendernet_tpu.cli train-shader
config.json`` (RenderNet_Shader.py invocation parity)."""
from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("config", type=str, help="path to a JSON training config")
    p.add_argument("--max-steps", type=int, default=None)
    p.add_argument("--no-mesh", action="store_true",
                   help="disable data-parallel device mesh")
    p.add_argument("--coordinator", type=str, default=None,
                   help="multi-host coordinator address host:port "
                        "(or set JAX_COORDINATOR_ADDRESS)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)

    from rendernet_tpu.train.distributed import initialize_multihost

    initialize_multihost(args.coordinator, args.num_processes, args.process_id)

    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.loop import train_shader

    cfg = TrainConfig.from_json(args.config)
    train_shader(
        cfg,
        max_steps=args.max_steps,
        use_mesh=not args.no_mesh,
        progress=lambda step, loss: (
            step % 20 == 0 and print(f"Step {step} Loss {float(loss)}")
        ),
    )


if __name__ == "__main__":
    main()
