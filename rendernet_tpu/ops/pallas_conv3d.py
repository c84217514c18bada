"""Implicit-GEMM 3D convolution for narrow-channel stacks (Pallas TPU).

WHY: XLA:TPU's lowering of the 3x3x3 stride-1 convs that dominate the
reference's 3D res stack (RenderNet_Shader.py:51-64: 32-channel blocks on a
32^3x32 grid) runs at ~20 TF/s on v5e (~10% MXU) in every conv-op
formulation we measured (plain NDHWC, depth-packed, block-banded). The op
is compute-lowering-bound, not bandwidth-bound, so the fix is a kernel that
feeds the MXU directly.

DESIGN (implicit GEMM):
  * Depth packing: computing ``f = 128//co`` depth-consecutive outputs per
    GEMM row widens the N dimension to ``f*co = 128`` — full MXU lanes.
  * XLA-side prep (cheap, fused): spatial zero-pad; a depth "unfold" that
    stacks the ``f+2`` padded depth taps every output block needs into the
    minor axis -> ``xd[B, H+2, W+2, D/f, (f+2)*C]``; the kernel weights
    packed to ``wp[3, 3, (f+2)*C, f*co]`` (tap kz feeds output slot i with
    logical depth offset kz-i when 0 <= kz-i <= 2, else zero).
  * Kernel: grid (B, H). Each program emits one output row as
    ``acc[W*D/f, 128] += piece(ky, kx) @ wp[ky, kx]`` over the 9 spatial
    taps, where ``piece`` is a static slice of one of three halo row views
    (the H halo is expressed by passing xd three times with block size 1
    along H and index maps h, h+1, h+2 — no overlapping blocks needed).
    M = W*D/f (256 at training shapes), K = (f+2)*C (192), N = 128: every
    dot is MXU-shaped, fp32 accumulation.
  * Backward: data grad = the same kernel with the spatially-flipped,
    io-swapped kernel (exact for SAME/stride-1/odd); weight grad = a
    sibling kernel accumulating ``piece^T @ dy_packed`` into the packed
    [3, 3, K, 128] gradient across the whole grid (output block pinned),
    unpacked to w-shape by summing the f slot-aliases in XLA.

Measured v5e (batch 24, 32^3x32ch, bf16): 0.95 ms fwd vs 4.6 ms for the
best XLA formulation (depth-packed); res-block chain fwd+bwd 3.3 ms vs
10.3 ms. Full shader step at batch 24/patch 64: 425 -> 305 ms.

Reference semantics: SAME, stride 1, odd kernel — the conv family of
tools/layer_util.py:228-267 as used by the res blocks (:60-121).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["nc_conv3d", "nc_conv3d_supported"]


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def nc_conv3d_supported(x_shape, w_shape, stride) -> bool:
    """True when (x, w, stride) fits this kernel's static envelope."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    kh, kw, kd, ci, co = w_shape
    if (kh, kw, kd) != (3, 3, 3) or any(s != 1 for s in stride):
        return False
    if co not in (16, 32, 64) or 128 % co:
        return False
    f = 128 // co
    b, h, wdim, d, c = x_shape
    if c != ci:
        return False
    # M = wdim * d // f must tile the 8-sublane register file; K is padded
    # to lanes anyway. Depth must split into whole blocks.
    return d % f == 0 and d // f >= 1 and (wdim * (d // f)) % 8 == 0 and h >= 1


def _unfold_depth(x: jnp.ndarray, f: int) -> jnp.ndarray:
    """[B, H, W, D, C] -> [B, H, W, D/f, (f+2)*C].

    Output block q's minor axis carries depth taps f*q - 1 .. f*q + f
    (zero outside [0, D)) in kz-major order — everything the block's f
    outputs need across the 3-tap logical kernel. Built ONLY from free
    reshapes and contiguous slices: the [D, C] -> [D/f, f*C] regroup is a
    no-op in channels-minor layout, the halo taps are one neighbor-block
    channel slice each. (A strided-slice formulation of the same unfold
    compiled to ~8 ms of XLA data shuffling at training shapes — 4x the
    whole conv kernel; this one is a single full-bandwidth concat.)
    """
    b, h, wd, d, c = x.shape
    nq = d // f
    xb = x.reshape(b, h, wd, nq, f * c)
    zero = jnp.zeros_like(xb[:, :, :, :1, :c])
    prev_last = jnp.concatenate([zero, xb[:, :, :, :-1, -c:]], axis=3)
    next_first = jnp.concatenate([xb[:, :, :, 1:, :c], zero], axis=3)
    return jnp.concatenate([prev_last, xb, next_first], axis=-1)


def _pack_weights(w: jnp.ndarray, f: int) -> jnp.ndarray:
    """[3,3,3,C,co] -> [3,3,(f+2)*C, f*co]; wp[.., kz*C+c, i*co+o] =
    w[.., kz-i, c, o] for 0 <= kz-i <= 2 (else 0)."""
    kh, kw, kd, c, co = w.shape
    wp = jnp.zeros((kh, kw, f + 2, c, f, co), w.dtype)
    for i in range(f):
        wp = wp.at[:, :, i : i + kd, :, i, :].set(w)
    return wp.reshape(kh, kw, (f + 2) * c, f * co)


def _unpack_weight_grad(gwp: jnp.ndarray, kd: int, c: int, f: int, co: int):
    """Adjoint of _pack_weights: [3,3,(f+2)*C,f*co] -> [3,3,3,C,co]."""
    kh, kw = gwp.shape[:2]
    g6 = gwp.reshape(kh, kw, f + 2, c, f, co)
    return sum(g6[:, :, i : i + kd, :, i, :] for i in range(f))


def _fwd_kernel(w_ref, x0_ref, x1_ref, x2_ref, o_ref, *, wdim, nq, k1, f, co):
    xs = (x0_ref, x1_ref, x2_ref)
    m = wdim * nq
    acc = jnp.zeros((m, f * co), jnp.float32)
    for ky in range(3):
        row = xs[ky][0, 0]  # [W+2, nq, K1]
        for kx in range(3):
            piece = row[kx : kx + wdim].reshape(m, k1)
            acc += jnp.dot(
                piece, w_ref[ky, kx], preferred_element_type=jnp.float32
            )
    o_ref[0, 0] = acc.reshape(wdim, nq, f * co).astype(o_ref.dtype)


def _wgrad_kernel(g_ref, x0_ref, x1_ref, x2_ref, o_ref, *, wdim, nq, k1, f, co):
    bi, hi = pl.program_id(0), pl.program_id(1)

    @pl.when((bi == 0) & (hi == 0))
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    xs = (x0_ref, x1_ref, x2_ref)
    m = wdim * nq
    g = g_ref[0, 0].reshape(m, f * co)
    for ky in range(3):
        row = xs[ky][0, 0]
        for kx in range(3):
            piece = row[kx : kx + wdim].reshape(m, k1)
            o_ref[ky, kx] += lax.dot_general(
                piece, g, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _conv_call(xd, wp, hout, wdim, nq, k1, f, co, out_dtype):
    b = xd.shape[0]
    kern = functools.partial(
        _fwd_kernel, wdim=wdim, nq=nq, k1=k1, f=f, co=co
    )

    def xspec(ky):
        return pl.BlockSpec(
            (1, 1, wdim + 2, nq, k1),
            lambda bi, hi, ky=ky: (bi, hi + ky, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    return pl.pallas_call(
        kern,
        grid=(b, hout),
        in_specs=[
            pl.BlockSpec(
                (3, 3, k1, f * co), lambda bi, hi: (0, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            xspec(0), xspec(1), xspec(2),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, wdim, nq, f * co), lambda bi, hi: (bi, hi, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hout, wdim, nq, f * co), out_dtype),
        interpret=not _on_tpu(),
    )(wp, xd, xd, xd)


def _nc_conv3d_expr(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    b, h, wdim, d, c = x.shape
    co = w.shape[-1]
    f = 128 // co
    nq = d // f
    k1 = (f + 2) * c
    xd = jnp.pad(
        _unfold_depth(x, f), ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0))
    )
    wp = _pack_weights(w, f)
    y = _conv_call(xd, wp, h, wdim, nq, k1, f, co, x.dtype)
    return y.reshape(b, h, wdim, d, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def nc_conv3d(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 3x3x3 conv, [B,H,W,D,C] @ [3,3,3,C,co] -> [B,H,W,D,co].

    Use :func:`nc_conv3d_supported` to gate; see module docstring for the
    kernel design. Differentiable in both arguments (custom VJP).
    """
    return _nc_conv3d_expr(x, w)


def _nc_fwd(x, w):
    return _nc_conv3d_expr(x, w), (x, w)


def _nc_bwd(res, gy):
    x, w = res
    b, h, wdim, d, c = x.shape
    kd = w.shape[2]
    co = w.shape[-1]
    f = 128 // co

    # Data grad: same conv of the cotangent with the flipped, io-swapped
    # kernel (exact adjoint for SAME/stride-1/odd kernels).
    wf = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    if nc_conv3d_supported(gy.shape, wf.shape, (1, 1, 1)):
        gx = _nc_conv3d_expr(gy, wf)
    else:  # e.g. co of the adjoint too wide/narrow for the envelope
        gx = lax.conv_general_dilated(
            gy, wf, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    # Weight grad: accumulate packed [3,3,K1,128] over the whole grid.
    nq = d // f
    k1 = (f + 2) * c
    xd = jnp.pad(
        _unfold_depth(x, f), ((0, 0), (1, 1), (1, 1), (0, 0), (0, 0))
    )
    gyp = gy.reshape(b, h, wdim, nq, f * co)
    kern = functools.partial(
        _wgrad_kernel, wdim=wdim, nq=nq, k1=k1, f=f, co=co
    )

    def xspec(ky):
        return pl.BlockSpec(
            (1, 1, wdim + 2, nq, k1),
            lambda bi, hi, ky=ky: (bi, hi + ky, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )

    gwp = pl.pallas_call(
        kern,
        grid=(b, h),
        in_specs=[
            pl.BlockSpec(
                (1, 1, wdim, nq, f * co), lambda bi, hi: (bi, hi, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            xspec(0), xspec(1), xspec(2),
        ],
        out_specs=pl.BlockSpec(
            (3, 3, k1, f * co), lambda bi, hi: (0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((3, 3, k1, f * co), jnp.float32),
        interpret=not _on_tpu(),
    )(gyp, xd, xd, xd)
    gw = _unpack_weight_grad(gwp, kd, c, f, co)
    return gx.astype(x.dtype), gw.astype(w.dtype)


nc_conv3d.defvjp(_nc_fwd, _nc_bwd)
