"""RenderNet shader model: voxel grid -> shaded/albedo image.

Architecture-parity target: ``RenderNet()`` in RenderNet_Shader.py:32-131 —
3x strided conv3d encoder (8/16/32 ch), 10x 3D res blocks + skip conv, the
learned projection unit, 10x 2D res blocks @ depth*32 channels + skip,
conv 512 -> 5 res blocks + skip -> conv 256 -> deconv chain
128(s2)/128(s1)/64(s2)/32(s2)/16(s1) -> 1-or-3 channel deconv + sigmoid.

Design is TPU-first: pure functions over a flat param pytree, channels-last
layouts throughout, a configurable compute dtype (bf16 on the MXU for the hot
1024-channel 2D res stack), and static shapes (the patch-size curriculum is a
set of jit specializations, not a dynamic shape). Parameter paths mirror the
TF variable scopes (``encoder/e_conv1/e_conv1/weights``) so the reference's
npz weight dumps import by key translation (see rendernet_tpu.compat).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rendernet_tpu.nn.layers import (
    Module,
    Params,
    conv2d,
    conv2d_transpose,
    conv3d,
    dropout,
    prelu,
    projection_unit,
    res_block_stack,
)
from rendernet_tpu.ops.resample import rotate_resample_to_camera

__all__ = ["ShaderConfig", "shader_rendernet", "shader_forward", "init_shader_params"]


@dataclasses.dataclass(frozen=True)
class ShaderConfig:
    """Static hyperparameters of the shader RenderNet.

    Defaults reproduce RenderNet_Shader.py:32-131 for a 128-deep camera grid
    (greyscale head). ``out_channels=3`` switches to the RGB head
    (RenderNet_Shader.py:125-130).
    """

    out_channels: int = 1
    keep_prob: float = 1.0
    enc_channels: Tuple[int, int, int] = (8, 16, 32)
    res1_blocks: int = 10
    res2_blocks: int = 10
    res3_blocks: int = 5
    base: int = 32  # deconv-chain channel base (32*16, 32*8, ... 16)
    new_size: int = 128  # camera-grid resolution the voxels are resampled to
    # Rematerialize each res block in the backward pass (jax.checkpoint):
    # trades ~1/3 more FLOPs for O(n_blocks) less activation memory —
    # enables full-resolution (128-patch) training and larger batches.
    remat: bool = False
    # Rematerialize ONLY the 3D res stack (res1). Its activations are
    # cheap to recompute (32-ch convs) but large in aggregate (~2 GB at
    # patch 128, batch 24); freeing them relieves the HBM pressure that
    # otherwise makes XLA auto-rematerialize ~100 ms of 1024-channel 2D
    # convs in the full-512 step. Subsumed by ``remat``.
    remat_3d: bool = False
    # Save-pre-activations-only res blocks (nn.layers._act_conv custom
    # VJP): per block, only the conv1 pre-activation is saved for the
    # backward pass and the activation output is recomputed from it — one
    # elementwise op per block, NO conv recompute, same math to fp32
    # roundoff. Cuts res-stack activation memory ~33% (~6 GB at patch
    # 128, batch 24, measured by AOT memory analysis) and measures +3.2%
    # at patch 64 (84.2 vs 81.6 frames/s); full-512 time is unchanged —
    # the step is conv-schedule-bound, not memory-bound
    # (docs/performance.md round-4 section). Subsumed by
    # ``remat``/``remat_3d`` where set.
    preact_policy: bool = False
    # Run each res stack as one lax.scan over stacked per-block params
    # (identical math and param naming, ~5x faster XLA compile, and with
    # remat one live block instead of n in the backward). Default OFF for
    # this model: at the training batch the scan's stacked-weight copies
    # push the step over a 16 GB chip unless remat is also on, and
    # scan+remat costs ~12% step time (measured v5e: 478 vs 420 ms).
    scan_blocks: bool = False


def shader_rendernet(m: Module, vox: jnp.ndarray, cfg: ShaderConfig) -> jnp.ndarray:
    """Run the shader network on a camera-aligned voxel grid.

    ``vox``: ``[B, H, W, D, C]`` (rotated+resampled, image-axis-aligned).
    Returns ``[B, 4*H, 4*W, cfg.out_channels]`` in [0, 1].
    """
    kp = cfg.keep_prob
    c1, c2, c3 = cfg.enc_channels
    with m.scope("encoder"):
        with m.scope("e_conv1"):
            x = conv3d(m, vox, c1, (5, 5, 5), (2, 2, 2), scope="e_conv1")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv2"):
            x = conv3d(m, x, c2, (3, 3, 3), (1, 1, 2), scope="e_conv2")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv3"):
            x = conv3d(m, x, c3, (3, 3, 3), (1, 1, 1), scope="e_conv3")
            x = dropout(m, prelu(m, x), kp)

        shortcut = x
        x = res_block_stack(
            m, x, cfg.res1_blocks, c3, "res1_{}", ndim=3,
            use_scan=cfg.scan_blocks, remat=cfg.remat or cfg.remat_3d,
            preact=cfg.preact_policy,
        )
        with m.scope("res1_skip"):
            x = conv3d(m, x, c3, (3, 3, 3), (1, 1, 1), scope="con1_3X3")
        x = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        # Learned 3D->2D projection: [B,H,W,D,C] -> [B,H,W,D*C].
        x = projection_unit(m, x)
        nf = x.shape[-1]  # depth*channels: 1024 for a 128-deep grid

        shortcut = x
        x = res_block_stack(
            m, x, cfg.res2_blocks, nf, "res2_{}", ndim=2,
            use_scan=cfg.scan_blocks, remat=cfg.remat,
            preact=cfg.preact_policy,
        )
        with m.scope("res2_skip"):
            x = conv2d(m, x, nf, (3, 3), (1, 1), scope="con1_3X3")
        x = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        b = cfg.base
        with m.scope("e_conv5"):
            x = conv2d(m, x, b * 16, (4, 4), (1, 1), scope="e_conv5")
            x = dropout(m, prelu(m, x), kp)
        shortcut = x
        x = res_block_stack(
            m, x, cfg.res3_blocks, b * 16, "res3_{}", ndim=2,
            use_scan=cfg.scan_blocks, remat=cfg.remat,
            preact=cfg.preact_policy,
        )
        with m.scope("res3_skip"):
            x = conv2d(m, x, b * 16, (3, 3), (1, 1), scope="con1_3X3")
        x = (x.astype(jnp.float32) + shortcut.astype(jnp.float32)).astype(
            m.compute_dtype
        )

        with m.scope("e_conv6"):
            x = conv2d(m, x, b * 8, (4, 4), (1, 1), scope="e_conv6")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv7"):
            x = conv2d_transpose(m, x, b * 4, (4, 4), (2, 2), scope="e_conv7")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv7_1"):
            x = conv2d_transpose(m, x, b * 4, (4, 4), (1, 1), scope="e_conv7_1")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv8"):
            x = conv2d_transpose(m, x, b * 2, (4, 4), (2, 2), scope="e_conv8")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv9"):
            x = conv2d_transpose(m, x, b, (4, 4), (2, 2), scope="e_conv9")
            x = dropout(m, prelu(m, x), kp)
        with m.scope("e_conv10"):
            x = conv2d_transpose(m, x, 16, (4, 4), (1, 1), scope="e_conv10")
            x = dropout(m, prelu(m, x), kp)
        # Final head lives directly under "encoder" (RenderNet_Shader.py:126).
        x = conv2d_transpose(m, x, cfg.out_channels, (4, 4), (1, 1), scope="e_conv11")
        return jax.nn.sigmoid(x.astype(jnp.float32))


def shader_forward(
    params: Params,
    voxels: jnp.ndarray,
    view_params: jnp.ndarray,
    cfg: ShaderConfig,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    resample: str = "exact",
) -> jnp.ndarray:
    """Full render pipeline: rotate+resample -> axis align -> network.

    Mirrors the graph at RenderNet_Shader.py:150-156 (minus the random crop,
    which the trainer applies between resample and network — see
    rendernet_tpu.ops.crops). ``resample``: "exact" (direct trilinear —
    bit-parity with the reference, the right choice for pretrained
    weights) or "multipass" (the fast Pallas kernel; ~100x the exact
    path's TPU gather cost, with a separable reconstruction filter's
    slight extra smoothing)."""
    m = Module(
        params=params,
        compute_dtype=compute_dtype,
        train=train,
        dropout_rng=dropout_rng,
    )
    if resample == "multipass":
        from rendernet_tpu.ops.pallas_resample import (
            rotate_resample_to_camera_multipass,
        )

        cam = rotate_resample_to_camera_multipass(
            voxels, view_params, new_size=cfg.new_size,
            compute_dtype=compute_dtype,
        )
    else:
        cam = rotate_resample_to_camera(voxels, view_params, new_size=cfg.new_size)
    return shader_rendernet(m, cam.astype(compute_dtype), cfg)


def init_shader_params(
    rng: jax.Array, cfg: ShaderConfig, patch_size: int | None = None
) -> Params:
    """Initialize parameters by tracing the model on a tiny (but depth-true)
    dummy input. Spatial H/W do not affect parameter shapes (fully conv);
    depth does (projection unit), so the dummy keeps full depth."""
    depth = cfg.new_size
    hw = patch_size if patch_size is not None else 8
    dummy = jnp.zeros((1, hw, hw, depth, 1), jnp.float32)
    m = Module(rng=rng)
    shader_rendernet(m, dummy, cfg)
    return m.params
