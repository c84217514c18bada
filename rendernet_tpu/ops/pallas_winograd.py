"""Fused Winograd F(2x2,3x3) convolution for the wide res stacks (Pallas TPU).

WHY: round 4 established the full-512 shader step is conv-schedule-bound
with its 3x3 stride-1 res-stack convs at ~93% per-op roofline — the only
remaining lever on the conv band is a FLOP-count cut, and Winograd
F(2x2,3x3) is 9/4 = 2.25x fewer MXU MACs. The pure-XLA expression of the
same algorithm (ops/winograd.py) is a MEASURED NEGATIVE — 2.2-3.1x slower
than the XLA conv at the res2/res3 training shapes
(benchmarks/results/winograd_bench_r4.json) — because the [16, B*nh*nw, C]
transformed-activation intermediate (825 MB bf16 at C=1024) round-trips
HBM between the transform fusions and the batched GEMM. This kernel is
the envelope analysis' named win condition (docs/performance.md): ONE
Pallas program that keeps the transformed tiles in VMEM —

    input transform (VPU, fp32)  ->  16 x [nw*bb, C] @ [C, bn] MXU dots
                                 ->  inverse transform (VPU)  ->  y

so HBM sees only x once per weight sweep and y once, exactly like a plain
conv, while the MXU runs 2.25x fewer MACs.

DESIGN (reusing the house implicit-GEMM patterns of ops/pallas_conv2d.py):

  * HWNC activation layout ``[H, W, B, C]``; the SAME halo comes from
    passing 2*th+2 overlapping H-row views of the padded input, block
    size 1 along H (plain block index maps express the overlap).
  * Each program owns th tile-rows (a tile = 2x2 output px, so one
    tile-row = 4 overlapping input rows -> 2 output rows) for one
    (batch-block bb, output-channel block bn) cell. Grid
    ``(K/bn, B/bb, nh/th)`` with the transformed weights U = G w G^T
    slowest-varying, so each [16, C, bn] U tile is DMA'd once.
  * Inside: the 16 taps d[r][s] are contiguous slices + axis-split
    reshapes of the row views (no strided loads); the Winograd transforms
    are 2-stage 4-term axpy chains in fp32 (VPU); the 16 frequency GEMMs
    accumulate in fp32 on the MXU with bf16 operands, matching the conv
    path's accumulation structure; the inverse transform folds the 16
    frequencies to 2x2 output phases which interleave into two output
    rows via an adjacent-axis reshape.
  * U is precomputed OUTSIDE the kernel in fp32 (tiny: [16, C, K]) and
    fed in the compute dtype.
  * Backward: data grad = this same kernel with the spatially-flipped,
    io-swapped weights (exact adjoint for SAME/stride-1 3x3); weight
    grad = XLA's conv wgrad (a [3,3] patch contraction — Winograd's
    2.25x does not apply to wgrad's shape, and XLA is already at
    roofline there). The VJP residual is the unpadded input, which is
    alive in the graph anyway (same rationale as pallas_conv2d's).

Numerics: identical algorithm to ops/winograd.py (transforms in fp32,
GEMM operands in the caller's dtype) — tests pin kernel == XLA expression
in interpret mode, and the XLA expression == lax conv up to transform
roundoff (tests/test_winograd.py). Any training default flip is gated by
benchmarks/winograd_quality_ab.py like the resample's.

Reference semantics anchor: the 3x3 stride-1 SAME res-block convs of
tools/layer_util.py:91-121.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rendernet_tpu.ops.winograd import _BT, _G, _AT  # transform matrices

__all__ = ["wino_conv2d", "wino_conv2d_supported"]

_VMEM_LIMIT = 100 * 1024 * 1024  # scoped limit; physical v5e VMEM is larger


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# Benchmark hook: force (bn, bb, th).
TILE_OVERRIDE = None


def _vmem_bytes(nw, bb, cch, bn, th, xbytes):
    """Working-set model (the Mosaic staging overshoot is absorbed by the
    raised scoped limit, as measured for pallas_conv2d)."""
    u = 16 * cch * bn * xbytes                      # held once
    xrows = 2 * (2 * th + 2) * (2 * nw + 2) * bb * cch * xbytes
    v = 16 * nw * bb * cch * 4                      # fp32 transform stage
    m = 16 * nw * bb * bn * 4                       # fp32 accumulators
    y = 2 * (2 * th) * (2 * nw) * bb * bn * xbytes
    return u + xrows + v + m + y


def _tiles(h, w, b, cch, co, xbytes):
    """(bn, bb, th) fitting VMEM, or None. Prefers large bn (fewer x
    sweeps), then SMALL bb — bb ascends so the first fit is the smallest
    batch block: GEMM M = nw*bb is already MXU-deep at bb=8 for the res
    shapes (nw=32 -> M=256) and a small bb keeps the fp32 accumulator
    footprint down, which is what lets bn=512 fit. (The round-5 tiling
    sweep measures the alternatives via TILE_OVERRIDE.)"""
    if TILE_OVERRIDE is not None:
        return TILE_OVERRIDE
    nw = w // 2
    nh = h // 2
    for bn in (512, 256, 128):
        if co % bn:
            continue
        for bb in (8, 16, b):
            if b % bb or (bb % 8 and bb != b):
                continue
            for th in (1, 2):
                if nh % th:
                    continue
                if _vmem_bytes(nw, bb, cch, bn, th, xbytes) <= _VMEM_LIMIT // 2:
                    return (bn, bb, th)
    return None


def wino_conv2d_supported(x_shape, w_shape, stride, dtype=jnp.bfloat16) -> bool:
    """Envelope: SAME 3x3 stride-1, even H/W, lane-aligned wide channels.

    ``dtype`` is the activation dtype the call will actually run in — the
    tiling fit depends on its itemsize, and the backward's data grad runs
    the kernel with ci/co SWAPPED, so both orientations must tile."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, ci, co = w_shape
    if (kh, kw) != (3, 3) or tuple(stride) != (1, 1):
        return False
    b, h, w, c = x_shape
    if c != ci or ci % 128 or co % 128 or ci < 256:
        return False
    if h % 2 or w % 2:
        return False
    # batch >= 8: at b=1 the only fitting batch-block is bb=1, whose
    # GEMM M = nw*1 is MXU-thin — measured 1.5x SLOWER single-request
    # serving (39.7 vs 26.9 ms demo composite) while batched serving
    # gains 22-30% (serving_bench r5). Training batches are 8/24.
    if b < 8:
        return False
    xbytes = jnp.dtype(dtype).itemsize
    return (
        _tiles(h, w, b, ci, co, xbytes) is not None
        and _tiles(h, w, b, co, ci, xbytes) is not None
    )


def _kernel(u_ref, *refs, nw, bb, cch, bn, th, out_dtype):
    x_rows = refs[:-1]
    y_ref = refs[-1]
    f32 = jnp.float32
    bt, at = _BT, _AT
    for tr in range(th):
        rows = [x_rows[2 * tr + r][0] for r in range(4)]  # [W+2, bb, C]
        # taps: d[r][s] = rows[r][s + 2j], j in [0, nw) — contiguous slice
        # + axis-split reshape + phase select (no strided loads)
        d = [
            [
                rows[r][s : s + 2 * nw].reshape(nw, 2, bb, cch)[:, 0]
                for s in range(4)
            ]
            for r in range(4)
        ]
        # V = B^T d B, two-stage 4-term axpy chains in fp32
        rowt = [
            [
                sum(
                    d[r][s].astype(f32) * float(bt[k1, r])
                    for r in range(4)
                    if bt[k1, r] != 0
                )
                for s in range(4)
            ]
            for k1 in range(4)
        ]
        m = []
        for k1 in range(4):
            for k2 in range(4):
                v = sum(
                    rowt[k1][s] * float(bt[k2, s])
                    for s in range(4)
                    if bt[k2, s] != 0
                )
                vb = v.reshape(nw * bb, cch).astype(u_ref.dtype)
                m.append(
                    jnp.dot(
                        vb,
                        u_ref[4 * k1 + k2],
                        preferred_element_type=f32,
                    )
                )  # [nw*bb, bn] fp32
        # Y = A^T M A -> 2x2 output phases
        rowo = [
            [
                sum(
                    m[4 * k1 + k2] * float(at[p1, k1])
                    for k1 in range(4)
                    if at[p1, k1] != 0
                )
                for k2 in range(4)
            ]
            for p1 in range(2)
        ]
        for p1 in range(2):
            y = [
                sum(
                    rowo[p1][k2] * float(at[p2, k2])
                    for k2 in range(4)
                    if at[p2, k2] != 0
                ).reshape(nw, bb, bn)
                for p2 in range(2)
            ]
            # interleave phases into one output row: out[2j + p2] = y[p2][j]
            row = jnp.stack(y, axis=1).reshape(2 * nw, bb, bn)
            y_ref[2 * tr + p1] = row.astype(out_dtype)


def _xspec(i, th, wp2, bb, cch):
    return pl.BlockSpec(
        (1, wp2, bb, cch),
        lambda nt, bi, ti, i=i: (ti * 2 * th + i, 0, bi, 0),
        memory_space=pltpu.VMEM,
    )


def _wino_call_hwnc(xh, u, co, bn, bb, th):
    """xh: HWNC [H, W, B, C]; u: [16, C, K] transformed weights."""
    h, w, b, cch = xh.shape
    nw = w // 2
    nh = h // 2
    # W pads to W+3: the tap-s contiguous slice [s : s+2nw] needs one
    # column past the SAME halo at s=3 (the extra zero col is never
    # selected by the phase pick, only loaded)
    xp = jnp.pad(xh, ((1, 1), (1, 2), (0, 0), (0, 0)))
    kern = functools.partial(
        _kernel, nw=nw, bb=bb, cch=cch, bn=bn, th=th, out_dtype=xh.dtype
    )
    in_specs = [
        pl.BlockSpec(
            (16, cch, bn),
            lambda nt, bi, ti: (0, 0, nt),
            memory_space=pltpu.VMEM,
        )
    ] + [_xspec(i, th, w + 3, bb, cch) for i in range(2 * th + 2)]
    args = [u] + [xp] * (2 * th + 2)
    return pl.pallas_call(
        kern,
        grid=(co // bn, b // bb, nh // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (2 * th, w, bb, bn),
            lambda nt, bi, ti: (ti, 0, bi, nt),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((h, w, b, co), xh.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(*args)


def _transform_weights(w: jnp.ndarray, dtype) -> jnp.ndarray:
    """U = G w G^T: [3,3,C,K] -> [16, C, K] (fp32 transform, tiny)."""
    g = jnp.asarray(_G, jnp.float32)
    u = jnp.einsum("ar,rscK,bs->abcK", g, w.astype(jnp.float32), g)
    c, k = w.shape[2], w.shape[3]
    return u.reshape(16, c, k).astype(dtype)


def _wino_expr(x, w):
    """NHWC forward through the fused kernel."""
    b, h, wd, c = x.shape
    co = w.shape[-1]
    tiles = _tiles(h, wd, b, c, co, jnp.dtype(x.dtype).itemsize)
    if tiles is None:
        raise ValueError(
            f"wino_conv2d: no tiling fits VMEM for {x.shape} -> {co}; gate "
            "calls with wino_conv2d_supported"
        )
    bn, bb, th = tiles
    xh = jnp.transpose(x, (1, 2, 0, 3))  # HWNC
    u = _transform_weights(w, x.dtype)
    yh = _wino_call_hwnc(xh, u, co, bn, bb, th)
    return jnp.transpose(yh, (2, 0, 1, 3))  # NHWC


# ---------------------------------------------------------------------------
# Transform-domain weight gradient (phase 2).
#
# The backward's dominant term is the wgrad: direct conv wgrad costs
# 9*C*K MACs per output pixel = 36*C*K per 2x2 tile, while the winograd-
# domain contraction gU[k] = V[k]^T @ dM[k] costs 16*C*K per tile — the
# same 2.25x cut as the forward. dM is the adjoint of the inverse output
# transform (spread each 2x2 gy tile into 16 frequencies by A), V is the
# same input transform the forward computes, and gw = G^T-fold of gU
# (tiny, fp32, outside the kernel). Exact adjoint of the winograd
# forward in exact arithmetic == the conv wgrad; in bf16 it carries the
# same bounded transform rounding as the forward (quality-gated like the
# forward by benchmarks/winograd_quality_ab.py --wgrad arm).
#
# Kernel layout mirrors the forward (HWNC row views, th tile-rows per
# program); the gU output block is PINNED across the (batch, tile-row)
# grid sweep and accumulated in fp32 VMEM (the pallas_conv3d wgrad
# pattern), one sweep per K block.
# ---------------------------------------------------------------------------

# Opt-in: replace the backward's XLA conv wgrad with the fused transform-
# domain kernel where its tiling fits. Values:
#   False  — XLA conv wgrad (default)
#   True   — bf16-operand GEMMs: fastest (+11.7% full-512 step) but
#            FAILED its quality arm at ratio 1.58 (weight-grad transform
#            noise feeds Adam directly — winograd_quality_ab_r5.json)
#   "fp32" — fp32-operand GEMMs via precision=HIGHEST (3-pass MXU):
#            keeps 16*3/36 = 1.33x of the MAC cut over the direct wgrad
#            while REMOVING the bf16 operand rounding the quality arm
#            rejected (transforms were already fp32; only the tile
#            contraction was bf16).
WGRAD = False


def _wgrad_tiles(h, w, b, cch, co, xbytes):
    """(bnk, bb, th) for the wgrad kernel, or None."""
    nw = w // 2
    nh = h // 2
    for bnk in (256, 128):
        if co % bnk:
            continue
        for bb in (8, 16, b):
            if b % bb or (bb % 8 and bb != b):
                continue
            for th in (1, 2):
                if nh % th:
                    continue
                gu = 16 * cch * bnk * 4
                v = 16 * nw * bb * cch * 4
                dm = 16 * nw * bb * bnk * 4
                xrows = 2 * (2 * th + 2) * (2 * nw + 2) * bb * cch * xbytes
                gyrows = 2 * th * (2 * nw) * bb * bnk * xbytes
                if gu + v + dm + xrows + gyrows <= _VMEM_LIMIT // 2:
                    return (bnk, bb, th)
    return None


def _wgrad_kernel(*refs, nw, bb, cch, bnk, th, opdtype):
    x_rows = refs[: 2 * th + 2]
    gy_ref = refs[2 * th + 2]
    gu_ref = refs[-1]
    f32 = jnp.float32
    bt, at = _BT, _AT

    nk, bi, ti = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when((bi == 0) & (ti == 0))
    def _():
        gu_ref[...] = jnp.zeros_like(gu_ref)

    for tr in range(th):
        rows = [x_rows[2 * tr + r][0] for r in range(4)]  # [W+3, bb, C]
        d = [
            [
                rows[r][s : s + 2 * nw].reshape(nw, 2, bb, cch)[:, 0]
                for s in range(4)
            ]
            for r in range(4)
        ]
        rowt = [
            [
                sum(
                    d[r][s].astype(f32) * float(bt[k1, r])
                    for r in range(4)
                    if bt[k1, r] != 0
                )
                for s in range(4)
            ]
            for k1 in range(4)
        ]
        # gy 2x2 phases for this tile-row: [nw, bb, K]
        g = [
            gy_ref[2 * tr + p1].reshape(nw, 2, bb, bnk)
            for p1 in range(2)
        ]
        gp = [[g[p1][:, p2] for p2 in range(2)] for p1 in range(2)]
        for k1 in range(4):
            for k2 in range(4):
                v = sum(
                    rowt[k1][s] * float(bt[k2, s])
                    for s in range(4)
                    if bt[k2, s] != 0
                ).reshape(nw * bb, cch)
                dm = sum(
                    gp[p1][p2].astype(f32)
                    * float(at[p1, k1] * at[p2, k2])
                    for p1 in range(2)
                    for p2 in range(2)
                    if at[p1, k1] * at[p2, k2] != 0
                ).reshape(nw * bb, bnk)
                gu_ref[4 * k1 + k2] += lax.dot_general(
                    v.astype(opdtype),
                    dm.astype(opdtype),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=(
                        lax.Precision.HIGHEST
                        if opdtype == jnp.float32
                        else None
                    ),
                )


def _wino_wgrad(x: jnp.ndarray, gy: jnp.ndarray) -> jnp.ndarray:
    """gw [3,3,C,K] of the SAME stride-1 3x3 conv via the transform-domain
    contraction (see block comment above). ``x`` NHWC, ``gy`` NHWC."""
    b, h, w, cch = x.shape
    co = gy.shape[-1]
    tiles = _wgrad_tiles(h, w, b, cch, co, jnp.dtype(x.dtype).itemsize)
    if tiles is None:
        raise ValueError(f"wino wgrad: no tiling fits for {x.shape}->{co}")
    bnk, bb, th = tiles
    nw, nh = w // 2, h // 2
    xh = jnp.transpose(x, (1, 2, 0, 3))  # HWNC
    xp = jnp.pad(xh, ((1, 1), (1, 2), (0, 0), (0, 0)))
    gyh = jnp.transpose(gy, (1, 2, 0, 3))  # HWNC

    kern = functools.partial(
        _wgrad_kernel, nw=nw, bb=bb, cch=cch, bnk=bnk, th=th,
        opdtype=jnp.float32 if WGRAD == "fp32" else x.dtype,
    )
    in_specs = (
        [_xspec(i, th, w + 3, bb, cch) for i in range(2 * th + 2)]
        + [
            pl.BlockSpec(
                (2 * th, w, bb, bnk),
                lambda nk, bi, ti: (ti, 0, bi, nk),
                memory_space=pltpu.VMEM,
            )
        ]
    )
    gu = pl.pallas_call(
        kern,
        grid=(co // bnk, b // bb, nh // th),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (16, cch, bnk),
            lambda nk, bi, ti: (0, 0, nk),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((16, cch, co), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(*([xp] * (2 * th + 2) + [gyh]))
    # gw[r,s] = sum_ab G[a,r] G[b,s] gU[ab] — the adjoint of U = G w G^T
    g = jnp.asarray(_G, jnp.float32)
    gu4 = gu.reshape(4, 4, cch, co)
    return jnp.einsum("ar,abcK,bs->rscK", g, gu4, g)


@jax.custom_vjp
def wino_conv2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 3x3 conv [B,H,W,C] @ [3,3,C,K] via fused Winograd.

    Equals ``lax.conv_general_dilated(x, w, (1,1), 'SAME')`` up to
    transform roundoff (the transforms run in fp32; GEMM operands stay in
    the caller's dtype)."""
    return _wino_expr(x, w)


def _fwd(x, w):
    return _wino_expr(x, w), (x, w)


def _bwd(res, gy):
    x, w = res
    gy = gy.astype(x.dtype)
    # data grad: Winograd conv of gy with the flipped, io-swapped kernel
    # (exact adjoint for SAME/stride-1). The supported() gate checks the
    # swapped ci/co tiling too, but an unchecked call (TILE_OVERRIDE, or
    # a caller bypassing the gate) may only tile forward — fall back to
    # XLA's transposed conv for the dgrad then.
    wt = jnp.transpose(w[::-1, ::-1], (0, 1, 3, 2))
    b_, h_, wd_, cg = gy.shape
    if _tiles(h_, wd_, b_, cg, wt.shape[-1],
              jnp.dtype(gy.dtype).itemsize) is not None:
        gx = _wino_expr(gy, wt)
    else:
        gx = lax.conv_general_dilated(
            gy, wt, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
    # weight grad: the fused transform-domain kernel when opted in and
    # its tiling fits (2.25x fewer MACs than the direct wgrad — see the
    # phase-2 block comment), else XLA's conv wgrad lowering.
    if WGRAD and _wgrad_tiles(
        x.shape[1], x.shape[2], x.shape[0], x.shape[3], gy.shape[-1],
        jnp.dtype(x.dtype).itemsize,
    ) is not None:
        gw = _wino_wgrad(x, gy).astype(w.dtype)
    else:
        _, conv_vjp = jax.vjp(
            lambda ww: lax.conv_general_dilated(
                x, ww, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ),
            w,
        )
        (gw,) = conv_vjp(gy)
    return gx, gw


wino_conv2d.defvjp(_fwd, _bwd)
