"""Gradient-based inverse rendering (shape/pose/texture/light recovery)."""
from rendernet_tpu.recon.inverse import (
    ReconConfig,
    Latents,
    ReconModel,
    recon_forward,
    recon_per_sample_loss,
    make_recon_step,
    create_param_center,
    initial_latents,
    subdivided_latents,
    reconstruct,
)

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
