"""Implicit-GEMM 2D convolution for the wide-channel res stacks (Pallas TPU).

WHY: after the projection unit, the shader net's FLOPs are dominated by the
3x3 stride-1 convs of the 2D res stacks at depth*32 channels — 1024 for the
128 camera grid (RenderNet_Shader.py:71-99: 10 blocks @1024 + 5 @512). These
are large, well-shaped GEMMs (M = B*H*W, K = 9C, N = C), but XLA:TPU's conv
lowering still leaves MXU headroom, most of it in the backward pass (see
benchmarks/conv2d_probe.py for the measured XLA numbers on the exact shapes
and benchmarks/conv2d_kernel_bench.py for kernel-vs-XLA).

DESIGN: the same halo-in-kernel implicit GEMM as ops/pallas_conv3d.py, with
the GEMM M dimension built from (width, batch-tile) instead of (width,
packed-depth):

  * The kernel's native activation layout is HWNC — ``[H, W, B, C]`` with
    batch third — so each H-row view is ``[W+2, bb, C]`` and the kx tap
    slice ``row[kx:kx+W]`` lands on the OUTERMOST axis, reshaping
    contiguously (zero-copy) to the ``[W*bb, C]`` GEMM operand. In NHWC the
    same slice is mid-axis and costs a VPU copy per tap (~87% overhead at
    these shapes).
  * Grid (co/bn, B/bb, H/bh), weights slowest-varying so each ``[3,3,C,bn]``
    weight tile is DMA'd once. Each program sees bh+2 overlapping H-row
    views (block size 1 along H — plain block index maps express the halo)
    and emits bh output rows; per output row and tap (ky, kx) one
    ``[W*bb, C] @ [C, bn]`` MXU dot with fp32 accumulation.
  * Backward: data grad = the same kernel with the spatially-flipped,
    io-swapped kernel (exact for SAME/stride-1/odd, co%128==ci%128==0 keeps
    it in-envelope); weight grad = a sibling kernel accumulating
    ``mid^T @ gy`` into a pinned [3,3,C,bn] fp32 block across the (B, H)
    grid. The padded input is the VJP residual (no re-pad in backward).
  * The NHWC wrapper transposes in/out; ``res_block_stack`` amortizes the
    transposes across a whole stack by staying in HWNC between blocks
    (bias/PReLU/residual are elementwise — layout-agnostic).

Reference semantics: SAME, stride 1, 3x3 — tools/layer_util.py:147-185 as
used by res_block_2d (:91-121).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "wc_conv2d",
    "wc_conv2d_hwnc",
    "wc_conv2d_supported",
    "nhwc_to_hwnc",
    "hwnc_to_nhwc",
]

# VMEM budget for tile selection (bytes). The model undercounts Mosaic's
# true scoped allocation by ~1.3x (extra staging buffers), so the kernels
# also raise the scoped-vmem limit from its 16 MiB default; measured OK on
# v5e (physical VMEM is far larger than the default scoped limit).
_VMEM_BUDGET = 13 * 1024 * 1024
_VMEM_LIMIT = 64 * 1024 * 1024


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _dtype_bytes(dt) -> int:
    return jnp.dtype(dt).itemsize


def _divisors_desc(n: int):
    return sorted((d for d in range(1, n + 1) if n % d == 0), reverse=True)


# Benchmark hook: force a specific (bn, bh, bb) tiling.
TILE_OVERRIDE = None


def _vmem_bytes(bh, bb, bn, wd, cch, xbytes):
    xrows = 2 * (bh + 2) * (wd + 2) * bb * cch * xbytes  # double-buffered
    wtile = 9 * cch * bn * xbytes  # held once (constant index map over B, H)
    out = 2 * bh * wd * bb * bn * xbytes
    acc = wd * bb * bn * 4
    return xrows + wtile + out + acc


def _vmem_bytes_wgrad(bh, bb, bn, wd, cch, xbytes):
    """Weight-grad kernel working set: the pinned fp32 [3,3,C,bn] output
    block dominates, so the wgrad pass picks its own (usually smaller-bn)
    tiling instead of sharing the forward's."""
    xrows = 2 * (bh + 2) * (wd + 2) * bb * cch * xbytes
    gy = 2 * bh * wd * bb * bn * xbytes
    out = 9 * cch * bn * 4
    acc = cch * bn * 4
    return xrows + gy + out + acc


def _bb_ok(bb: int, b: int) -> bool:
    """Mosaic block-shape rule: bb sits in the second-to-last block dim of
    the activation/output blocks, so it must be a multiple of 8 or span the
    whole batch (enforced by the TPU lowering; interpret mode is looser)."""
    return bb % 8 == 0 or bb == b


def _tiles_wgrad(h, wd, b, cch, co, xbytes):
    """(bn, bh, bb) for the weight-grad kernel, or None.

    The GEMM contraction dim is M = wd*bb, so larger bb amortizes the MXU
    better; input refetch cost mirrors the forward's."""
    if TILE_OVERRIDE is not None:
        return TILE_OVERRIDE
    best = None
    for bn in (256, 128):
        if co % bn:
            continue
        for bb in _divisors_desc(b):
            if not _bb_ok(bb, b):
                continue
            m = wd * bb
            if m > 512 or m % 8:
                continue
            for bh in (8, 4, 2, 1):
                if h % bh:
                    continue
                if _vmem_bytes_wgrad(bh, bb, bn, wd, cch, xbytes) > _VMEM_BUDGET:
                    continue
                cost = (bh + 2) / bh * (co // bn)
                key = (cost, -m, -bh)
                if best is None or key < best[0]:
                    best = (key, (bn, bh, bb))
                break
    return None if best is None else best[1]


def _tiles(h, wd, b, cch, co, xbytes):
    """(bn, bh, bb) fitting the VMEM budget, or None.

    Picks the candidate minimizing input HBM traffic — refetch factor
    (bh+2)/bh (H-halo overlap) times co/bn (one input sweep per weight
    tile) — tie-broken toward a larger GEMM M = W*bb and larger bh.
    """
    if TILE_OVERRIDE is not None:
        return TILE_OVERRIDE
    best = None
    for bn in (256, 128):
        if co % bn:
            continue
        for bb in _divisors_desc(b):
            if not _bb_ok(bb, b):
                continue
            m = wd * bb
            if m > 512 or m % 8:
                continue
            for bh in (8, 4, 2, 1):
                if h % bh:
                    continue
                if _vmem_bytes(bh, bb, bn, wd, cch, xbytes) > _VMEM_BUDGET:
                    continue
                cost = (bh + 2) / bh * (co // bn)
                key = (cost, -m, -bh)
                if best is None or key < best[0]:
                    best = (key, (bn, bh, bb))
                break  # smaller bh only raises cost at this (bn, bb)
    return None if best is None else best[1]


def wc_conv2d_supported(x_shape, w_shape, stride) -> bool:
    """True when (NHWC x, HWIO w, stride) fits this kernel's envelope."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, ci, co = w_shape
    if (kh, kw) != (3, 3) or any(s != 1 for s in stride):
        return False
    b, h, wd, c = x_shape
    if c != ci or ci % 128 or co % 128 or ci < 256:
        return False
    return (
        _tiles(h, wd, b, ci, co, 2) is not None
        and _tiles_wgrad(h, wd, b, ci, co, 2) is not None
    )


# ---------------------------------------------------------------------------
# layout helpers
# ---------------------------------------------------------------------------
def nhwc_to_hwnc(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, W, C] -> [H, W, B, C] (the kernel's native layout)."""
    return jnp.transpose(x, (1, 2, 0, 3))


def hwnc_to_nhwc(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.transpose(x, (2, 0, 1, 3))


def _pad_hw(xh: jnp.ndarray) -> jnp.ndarray:
    """[H, W, B, C] -> [H+2, W+2, B, C] zero halo."""
    return jnp.pad(xh, ((1, 1), (1, 1), (0, 0), (0, 0)))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------
def _fwd_kernel(w_ref, *refs, wd, bb, cch, bn, bh):
    x_rows, o_ref = refs[:-1], refs[-1]
    m = wd * bb
    for hh in range(bh):
        acc = jnp.zeros((m, bn), jnp.float32)
        for ky in range(3):
            row = x_rows[hh + ky][0]  # [W+2, bb, C]
            for kx in range(3):
                mid = row[kx : kx + wd].reshape(m, cch)
                acc += jnp.dot(
                    mid, w_ref[ky, kx], preferred_element_type=jnp.float32
                )
        o_ref[hh] = acc.reshape(wd, bb, bn).astype(o_ref.dtype)


def _wgrad_kernel(g_ref, *refs, wd, bb, cch, bn, bh):
    x_rows, o_ref = refs[:-1], refs[-1]
    bi, hi = pl.program_id(1), pl.program_id(2)

    @pl.when((bi == 0) & (hi == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    m = wd * bb
    for ky in range(3):
        for kx in range(3):
            acc = jnp.zeros((cch, bn), jnp.float32)
            for hh in range(bh):
                g = g_ref[hh].reshape(m, bn)
                row = x_rows[hh + ky][0]
                mid = row[kx : kx + wd].reshape(m, cch)
                acc += lax.dot_general(
                    mid, g, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            o_ref[ky, kx] += acc


def _xspec(i, bh, wp2, bb, cch):
    """H-row view i of bh+2: block size 1 along H expresses the halo."""
    return pl.BlockSpec(
        (1, wp2, bb, cch),
        lambda nt, bi, hi, i=i: (hi * bh + i, 0, bi, 0),
        memory_space=pltpu.VMEM,
    )


def _conv_call(xp, w9, bn, bh, bb, out_dtype):
    hp2, wp2, b, cch = xp.shape
    h, wd = hp2 - 2, wp2 - 2
    co = w9.shape[-1]
    kern = functools.partial(
        _fwd_kernel, wd=wd, bb=bb, cch=cch, bn=bn, bh=bh
    )
    return pl.pallas_call(
        kern,
        grid=(co // bn, b // bb, h // bh),
        in_specs=[
            pl.BlockSpec(
                (3, 3, cch, bn), lambda nt, bi, hi: (0, 0, 0, nt),
                memory_space=pltpu.VMEM,
            )
        ]
        + [_xspec(i, bh, wp2, bb, cch) for i in range(bh + 2)],
        out_specs=pl.BlockSpec(
            (bh, wd, bb, bn), lambda nt, bi, hi: (hi, 0, bi, nt),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((h, wd, b, co), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(w9, *([xp] * (bh + 2)))


def _wc_conv2d_padded(xp, w, out_dtype):
    """Conv on an already-padded HWNC input [H+2, W+2, B, C]."""
    hp2, wp2, b, cch = xp.shape
    co = w.shape[-1]
    tiles = _tiles(hp2 - 2, wp2 - 2, b, cch, co, _dtype_bytes(xp.dtype))
    if tiles is None:
        raise ValueError(
            f"wc_conv2d: no tiling fits VMEM for input {xp.shape} -> {co} "
            f"channels; gate calls with wc_conv2d_supported"
        )
    bn, bh, bb = tiles
    return _conv_call(xp, w, bn, bh, bb, out_dtype)


def _wc_conv2d_expr(xh, w):
    return _wc_conv2d_padded(_pad_hw(xh), w, xh.dtype)


@jax.custom_vjp
def wc_conv2d_hwnc(xh: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 3x3 conv in HWNC layout:
    [H, W, B, C] @ [3, 3, C, co] -> [H, W, B, co].

    Gate with :func:`wc_conv2d_supported` (NHWC shape convention). Fully
    differentiable (custom VJP); see module docstring for the design.
    """
    return _wc_conv2d_expr(xh, w)


def _wc_fwd(xh, w):
    xp = _pad_hw(xh)
    return _wc_conv2d_padded(xp, w, xh.dtype), (xp, w)


def _wc_bwd(res, gy):
    xp, w = res
    hp2, wp2, b, cch = xp.shape
    h, wd = hp2 - 2, wp2 - 2
    co = w.shape[-1]

    # Data grad: same conv of the cotangent with the flipped, io-swapped
    # kernel (exact adjoint for SAME/stride-1/odd kernels; co and ci are
    # both 128-multiples so the adjoint stays in-envelope).
    wf = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    gx = _wc_conv2d_padded(_pad_hw(gy), wf, xp.dtype)

    # Weight grad: pinned [3,3,C,bn] fp32 accumulators over the (B, H) grid,
    # with its own tiling (the pinned block dominates its VMEM).
    tiles = _tiles_wgrad(h, wd, b, cch, co, _dtype_bytes(xp.dtype))
    bn, bh, bb = tiles
    kern = functools.partial(
        _wgrad_kernel, wd=wd, bb=bb, cch=cch, bn=bn, bh=bh
    )
    gw = pl.pallas_call(
        kern,
        grid=(co // bn, b // bb, h // bh),
        in_specs=[
            pl.BlockSpec(
                (bh, wd, bb, bn), lambda nt, bi, hi: (hi, 0, bi, nt),
                memory_space=pltpu.VMEM,
            )
        ]
        + [_xspec(i, bh, wp2, bb, cch) for i in range(bh + 2)],
        out_specs=pl.BlockSpec(
            (3, 3, cch, bn), lambda nt, bi, hi: (0, 0, 0, nt),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, cch, co), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(gy, *([xp] * (bh + 2)))
    return gx, gw.astype(w.dtype)


wc_conv2d_hwnc.defvjp(_wc_fwd, _wc_bwd)


def wc_conv2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """NHWC wrapper: [B, H, W, C] @ [3, 3, C, co] -> [B, H, W, co].

    Two layout transposes per call (~8% of the conv's MXU time at the res2
    shapes); res_block_stack amortizes them across a whole stack by calling
    :func:`wc_conv2d_hwnc` directly between a single in/out transpose pair.
    """
    return hwnc_to_nhwc(wc_conv2d_hwnc(nhwc_to_hwnc(x), w))
