"""Implicit-GEMM 2D convolution for the wide-channel res stacks (Pallas TPU).

WHY: after the projection unit, the shader net's FLOPs are dominated by the
3x3 stride-1 convs of the 2D res stacks at depth*32 channels — 1024 for the
128 camera grid (RenderNet_Shader.py:71-99: 10 blocks @1024 + 5 @512). These
are large, well-shaped GEMMs (M = B*H*W, K = 9C, N = C), but XLA:TPU's conv
lowering still leaves MXU headroom: the measured ~2x gap is on the convs XLA
fuses a PReLU epilogue into (docs/performance.md). This kernel therefore
carries the res-block epilogues ITSELF — bias, PReLU/ReLU, and the residual
skip-add — applied to the fp32 accumulator in VMEM before the single output
write, so the MXU loop stays the plain-conv one and no separate elementwise
passes (or XLA epilogue-fused conv slowdowns) remain.

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
  * Epilogues: per-channel bias and PReLU alpha ride along as tiny [1, bn]
    blocks; the residual skip input shares the output's block spec. The
    PReLU variant additionally emits the pre-activation as a second output
    — the VJP residual (needed for d/dz and d/dalpha) — costing one extra
    output write instead of recomputation.
  * Backward: data grad = the same kernel with the spatially-flipped,
    io-swapped kernel (exact for SAME/stride-1/odd, co%128==ci%128==0 keeps
    it in-envelope); weight grad = a sibling kernel accumulating
    ``mid^T @ gy`` into a pinned [3,3,C,bn] fp32 block across the (B, H)
    grid. The UNPADDED input is the VJP residual (the chain value that is
    alive in the graph anyway) and the backward re-pads it: saving the
    padded copy instead costs +H*W*B*C bytes PER CONV held to the
    backward pass — at full-512 training (64^2 x 1024ch x batch 24,
    20 res-stack convs) that is ~4 GB, the exact amount by which the
    fused path exceeded HBM in round 2 (the "remote-compile HTTP 500"
    was the compile server reporting 19.78G > 15.75G). A transient
    re-pad in backward is one 201 MB copy that dies immediately.
    The epilogue backward (PReLU mask, bias reduce) is one fused XLA
    elementwise pass feeding both dgrad and wgrad.
  * The NHWC wrapper transposes in/out; ``res_block_stack`` amortizes the
    transposes across a whole stack by staying in HWNC between blocks.

Reference semantics: SAME, stride 1, 3x3 + bias + PReLU/ReLU + skip —
tools/layer_util.py:91-121 (res_block_2d) and :147-185 (conv2d).

STATUS after rounds 3-4 (measured; docs/performance.md): TRAINING keeps
the XLA path. Five end-to-end negatives at full-512 — the fused stacks'
footprint (epilogue z-residuals + Mosaic staging + HWNC boundaries)
forces the remat fallback (16.8 fps), the recompute-VJP PReLU variant
still exceeds HBM (15.6), and at the network level kernel-vs-XLA is a
TIE with full gradients (301.7 vs 300.8 ms) — XLA:TPU's conv lowering
is at par on these wide-channel shapes, and round 4 established the
full-512 step is conv-schedule-bound, not memory-bound, so there is no
fusion dividend left to harvest. The module's LIVE role is the
fwd-only/serving envelope, where the fused conv+PReLU beats XLA at the
res-stack shapes (14.8 vs 16.1 ms at 64^2 isolated; serving A/B:
benchmarks/serving_bench.py RENDERNET_BENCH_PALLAS2D=0/1), plus being
the measured-negative record that documents WHY the default is XLA.
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
    "wc_conv2d_prelu_hwnc",
    "wc_conv2d_relu_hwnc",
    "wc_conv2d_res_hwnc",
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

# PReLU VJP residual strategy. True (default): the fwd kernel emits the
# pre-activation z as a second output — cheapest backward, but z is an
# EXTRA [H,W,B,C] residual per block (+2 GB at full-512 training, which
# is what forces the remat fallback there). False: fwd emits only y; the
# backward RECOMPUTES z with one plain conv+bias kernel call per block
# (~9.3 ms at 64^2x1024) — trading FLOPs for exactly that headroom.
PRELU_SAVE_PRE = True


def _vmem_bytes(bh, bb, bn, wd, cch, xbytes, obufs=1):
    """Working set; ``obufs`` counts output-sized streams (the plain conv
    has 1; the PReLU variant's pre-activation output and the residual
    variant's skip input each add one)."""
    xrows = 2 * (bh + 2) * (wd + 2) * bb * cch * xbytes  # double-buffered
    wtile = 9 * cch * bn * xbytes  # held once (constant index map over B, H)
    out = obufs * 2 * bh * wd * bb * bn * xbytes
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


def _tiles(h, wd, b, cch, co, xbytes, obufs=1):
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
                if _vmem_bytes(bh, bb, bn, wd, cch, xbytes, obufs) > _VMEM_BUDGET:
                    continue
                cost = (bh + 2) / bh * (co // bn)
                key = (cost, -m, -bh)
                if best is None or key < best[0]:
                    best = (key, (bn, bh, bb))
                break  # smaller bh only raises cost at this (bn, bb)
    return None if best is None else best[1]


def wc_conv2d_supported(x_shape, w_shape, stride, obufs=1) -> bool:
    """True when (NHWC x, HWIO w, stride) fits this kernel's envelope.

    ``obufs=2`` additionally requires the fused-epilogue variants (PReLU
    pre-activation output / residual skip input) to fit VMEM — gate a whole
    fused res-block stack with that."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    kh, kw, ci, co = w_shape
    if (kh, kw) != (3, 3) or any(s != 1 for s in stride):
        return False
    b, h, wd, c = x_shape
    if c != ci or ci % 128 or co % 128 or ci < 256:
        return False
    return (
        _tiles(h, wd, b, ci, co, 2, obufs) is not None
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
def _fwd_kernel(
    w_ref, *refs, wd, bb, cch, bn, bh, has_bias, act, has_res, emit_pre
):
    """Implicit-GEMM conv with an optional fused epilogue.

    ``refs`` order: [bias?, alpha?, res?] + x_rows(bh+2) + [y, pre?].
    The epilogue runs on the fp32 accumulator — bias add, optional
    pre-activation emit, PReLU/ReLU, optional residual add — then ONE
    rounding to the output dtype."""
    i = 0
    b_ref = al_ref = r_ref = None
    if has_bias:
        b_ref = refs[i]
        i += 1
    if act == "prelu":
        al_ref = refs[i]
        i += 1
    if has_res:
        r_ref = refs[i]
        i += 1
    x_rows = refs[i : i + bh + 2]
    outs = refs[i + bh + 2 :]
    y_ref = outs[0]
    z_ref = outs[1] if emit_pre else None

    bias = b_ref[0].astype(jnp.float32) if has_bias else None  # [bn]
    alpha = al_ref[0].astype(jnp.float32) if al_ref is not None else None

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
        if bias is not None:
            acc = acc + bias
        if emit_pre:
            z_ref[hh] = acc.reshape(wd, bb, bn).astype(z_ref.dtype)
        if act == "prelu":
            acc = jnp.maximum(acc, 0.0) + alpha * jnp.minimum(acc, 0.0)
        elif act == "relu":
            acc = jnp.maximum(acc, 0.0)
        acc = acc.reshape(wd, bb, bn)
        if has_res:
            acc = acc + r_ref[hh].astype(jnp.float32)
        y_ref[hh] = acc.astype(y_ref.dtype)


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


def _chanspec(bn):
    """Per-output-channel epilogue vector (bias / alpha), held as [1, co]."""
    return pl.BlockSpec(
        (1, bn), lambda nt, bi, hi: (0, nt), memory_space=pltpu.VMEM
    )


def _outspec(bh, wd, bb, bn):
    return pl.BlockSpec(
        (bh, wd, bb, bn), lambda nt, bi, hi: (hi, 0, bi, nt),
        memory_space=pltpu.VMEM,
    )


def _conv_call(
    xp,
    w9,
    bn,
    bh,
    bb,
    out_dtype,
    bias=None,
    alpha=None,
    res=None,
    act="none",
    emit_pre=False,
):
    hp2, wp2, b, cch = xp.shape
    h, wd = hp2 - 2, wp2 - 2
    co = w9.shape[-1]
    kern = functools.partial(
        _fwd_kernel,
        wd=wd, bb=bb, cch=cch, bn=bn, bh=bh,
        has_bias=bias is not None, act=act, has_res=res is not None,
        emit_pre=emit_pre,
    )
    in_specs = [
        pl.BlockSpec(
            (3, 3, cch, bn), lambda nt, bi, hi: (0, 0, 0, nt),
            memory_space=pltpu.VMEM,
        )
    ]
    args = [w9]
    if bias is not None:
        in_specs.append(_chanspec(bn))
        args.append(bias.reshape(1, co))
    if act == "prelu":
        in_specs.append(_chanspec(bn))
        args.append(alpha.reshape(1, co))
    if res is not None:
        in_specs.append(_outspec(bh, wd, bb, bn))
        args.append(res)
    in_specs += [_xspec(i, bh, wp2, bb, cch) for i in range(bh + 2)]
    args += [xp] * (bh + 2)
    out_shape = jax.ShapeDtypeStruct((h, wd, b, co), out_dtype)
    out_specs = _outspec(bh, wd, bb, bn)
    if emit_pre:
        out_shape = (out_shape, jax.ShapeDtypeStruct((h, wd, b, co), out_dtype))
        out_specs = (out_specs, _outspec(bh, wd, bb, bn))
    return pl.pallas_call(
        kern,
        grid=(co // bn, b // bb, h // bh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(*args)


def _wc_conv2d_padded(xp, w, out_dtype, obufs=1, **epilogue):
    """Conv on an already-padded HWNC input [H+2, W+2, B, C]."""
    hp2, wp2, b, cch = xp.shape
    co = w.shape[-1]
    tiles = _tiles(hp2 - 2, wp2 - 2, b, cch, co, _dtype_bytes(xp.dtype), obufs)
    if tiles is None:
        raise ValueError(
            f"wc_conv2d: no tiling fits VMEM for input {xp.shape} -> {co} "
            f"channels (obufs={obufs}); gate calls with wc_conv2d_supported"
        )
    bn, bh, bb = tiles
    return _conv_call(xp, w, bn, bh, bb, out_dtype, **epilogue)


def _wc_conv2d_expr(xh, w):
    return _wc_conv2d_padded(_pad_hw(xh), w, xh.dtype)


# ---------------------------------------------------------------------------
# shared backward pieces
# ---------------------------------------------------------------------------
def _dgrad(gz, w, out_dtype):
    """Data grad: same conv of the cotangent with the flipped, io-swapped
    kernel (exact adjoint for SAME/stride-1/odd kernels; co and ci are both
    128-multiples so the adjoint stays in-envelope)."""
    wf = jnp.flip(w, axis=(0, 1)).swapaxes(2, 3)
    return _wc_conv2d_padded(_pad_hw(gz), wf, out_dtype)


def _wgrad(xp, gy, co):
    """Weight grad: pinned [3,3,C,bn] fp32 accumulators over the (B, H)
    grid, with its own tiling (the pinned block dominates its VMEM)."""
    hp2, wp2, b, cch = xp.shape
    h, wd = hp2 - 2, wp2 - 2
    bn, bh, bb = _tiles_wgrad(h, wd, b, cch, co, _dtype_bytes(xp.dtype))
    kern = functools.partial(
        _wgrad_kernel, wd=wd, bb=bb, cch=cch, bn=bn, bh=bh
    )
    return pl.pallas_call(
        kern,
        grid=(co // bn, b // bb, h // bh),
        in_specs=[_outspec(bh, wd, bb, bn)]
        + [_xspec(i, bh, wp2, bb, cch) for i in range(bh + 2)],
        out_specs=pl.BlockSpec(
            (3, 3, cch, bn), lambda nt, bi, hi: (0, 0, 0, nt),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, cch, co), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=not _on_tpu(),
    )(gy, *([xp] * (bh + 2)))


def _repad(xh):
    """Backward-pass re-pad behind an optimization barrier: a plain
    ``_pad_hw(xh)`` here would CSE with the forward's pad of the same
    array, resurrecting the very padded-residual liveness the unpadded
    residual exists to avoid (the +4 GB at full-512 training). The
    barrier makes the backward pad a distinct, transient op."""
    return _pad_hw(jax.lax.optimization_barrier(xh))


def _sum_hwn(x):
    """Reduce [H, W, B, co] -> [co] in fp32 (bias-style grads)."""
    return jnp.sum(x.astype(jnp.float32), axis=(0, 1, 2))


# ---------------------------------------------------------------------------
# public ops (custom VJPs)
# ---------------------------------------------------------------------------
@jax.custom_vjp
def wc_conv2d_hwnc(xh: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 3x3 conv in HWNC layout:
    [H, W, B, C] @ [3, 3, C, co] -> [H, W, B, co].

    Gate with :func:`wc_conv2d_supported` (NHWC shape convention). Fully
    differentiable (custom VJP); see module docstring for the design.
    """
    return _wc_conv2d_expr(xh, w)


def _wc_fwd(xh, w):
    return _wc_conv2d_expr(xh, w), (xh, w)


def _wc_bwd(res, gy):
    xh, w = res
    gx = _dgrad(gy, w, xh.dtype)
    gw = _wgrad(_repad(xh), gy, w.shape[-1])
    return gx, gw.astype(w.dtype)


wc_conv2d_hwnc.defvjp(_wc_fwd, _wc_bwd)


@jax.custom_vjp
def wc_conv2d_prelu_hwnc(xh, w, b, alpha):
    """Fused ``prelu(conv(x, w) + b, alpha)`` in HWNC layout.

    Epilogue semantics: tools/layer_util.py:27-45 (PReLU, per-channel
    alpha) applied to the conv+bias pre-activation, all on the fp32
    accumulator inside the kernel."""
    return _wc_conv2d_padded(
        _pad_hw(xh), w, xh.dtype, obufs=1, bias=b, alpha=alpha, act="prelu"
    )


def _wc_prelu_fwd(xh, w, b, alpha):
    if PRELU_SAVE_PRE:
        # emit_pre: the pre-activation z is the VJP residual (PReLU
        # backward needs its sign and its negative part for d/dalpha).
        y, z = _wc_conv2d_padded(
            _pad_hw(xh), w, xh.dtype, obufs=2, bias=b, alpha=alpha,
            act="prelu", emit_pre=True,
        )
        return y, (xh, w, b, alpha, z)
    y = _wc_conv2d_padded(
        _pad_hw(xh), w, xh.dtype, obufs=1, bias=b, alpha=alpha, act="prelu"
    )
    return y, (xh, w, b, alpha, None)


def _wc_prelu_bwd(res, gy):
    xh, w, b, alpha, z = res
    xp = _repad(xh)
    if z is None:
        # Recompute the pre-activation with one plain conv+bias call —
        # see PRELU_SAVE_PRE.
        z = _wc_conv2d_padded(xp, w, gy.dtype, obufs=1, bias=b)
    # One fused XLA elementwise pass: PReLU mask + d/dalpha + bias reduce.
    gz = jnp.where(z > 0, gy, alpha.astype(gy.dtype) * gy)
    galpha = jnp.sum(
        gy.astype(jnp.float32) * jnp.minimum(z.astype(jnp.float32), 0.0),
        axis=(0, 1, 2),
    )
    gb = _sum_hwn(gz)
    gx = _dgrad(gz, w, xp.dtype)
    gw = _wgrad(xp, gz, w.shape[-1])
    return gx, gw.astype(w.dtype), gb.astype(gy.dtype), galpha.astype(gy.dtype)


wc_conv2d_prelu_hwnc.defvjp(_wc_prelu_fwd, _wc_prelu_bwd)


@jax.custom_vjp
def wc_conv2d_relu_hwnc(xh, w, b):
    """Fused ``relu(conv(x, w) + b)`` in HWNC layout (the pretrained-path
    res-block activation, tools/layer_util.py:91-121)."""
    return _wc_conv2d_padded(
        _pad_hw(xh), w, xh.dtype, obufs=1, bias=b, act="relu"
    )


def _wc_relu_fwd(xh, w, b):
    y = _wc_conv2d_padded(
        _pad_hw(xh), w, xh.dtype, obufs=1, bias=b, act="relu"
    )
    # y > 0 iff z > 0 (ReLU), so the primal output doubles as the mask.
    return y, (xh, w, y)


def _wc_relu_bwd(res, gy):
    xh, w, y = res
    xp = _repad(xh)
    gz = jnp.where(y > 0, gy, jnp.zeros_like(gy))
    gb = _sum_hwn(gz)
    gx = _dgrad(gz, w, xp.dtype)
    gw = _wgrad(xp, gz, w.shape[-1])
    return gx, gw.astype(w.dtype), gb.astype(gy.dtype)


wc_conv2d_relu_hwnc.defvjp(_wc_relu_fwd, _wc_relu_bwd)


@jax.custom_vjp
def wc_conv2d_res_hwnc(xh, w, b, res):
    """Fused ``conv(x, w) + b + res`` in HWNC layout — the second conv of a
    res block with the skip-add folded into the epilogue
    (tools/layer_util.py:91-121: ``conv2 + input``)."""
    return _wc_conv2d_padded(
        _pad_hw(xh), w, xh.dtype, obufs=2, bias=b, res=res
    )


def _wc_res_fwd(xh, w, b, res):
    y = _wc_conv2d_padded(
        _pad_hw(xh), w, xh.dtype, obufs=2, bias=b, res=res
    )
    return y, (xh, w)


def _wc_res_bwd(resids, gy):
    xh, w = resids
    gx = _dgrad(gy, w, xh.dtype)
    gw = _wgrad(_repad(xh), gy, w.shape[-1])
    return gx, gw.astype(w.dtype), _sum_hwn(gy).astype(gy.dtype), gy


wc_conv2d_res_hwnc.defvjp(_wc_res_fwd, _wc_res_bwd)


def wc_conv2d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """NHWC wrapper: [B, H, W, C] @ [3, 3, C, co] -> [B, H, W, co].

    Two layout transposes per call (~8% of the conv's MXU time at the res2
    shapes); res_block_stack amortizes them across a whole stack by calling
    :func:`wc_conv2d_hwnc` directly between a single in/out transpose pair.
    """
    return hwnc_to_nhwc(wc_conv2d_hwnc(nhwc_to_hwnc(x), w))
