"""Phase-space (space-to-depth) rewrite of strided 3D convolutions.

WHY: the texture/shader encoders open with spatially-huge, narrow-channel
STRIDED convs on the 128^3 camera grid (reference semantics:
`RenderNet_Shader.py:36-47` / `RenderNet_Texture_Face_Normal.py:48-60` —
e_conv1 5x5x5 stride 2 on 128^3 x 1|5 ch, e_conv2 3x3x3 stride (1,1,2)).
XLA:TPU runs their forward as re-layout-heavy fusions (the texture step's
"data formatting" band is 2.5x the shader's — docs/performance.md), and
their DATA GRADIENT as an input-dilated conv back at full 128^3 resolution
— the single biggest op in the texture step trace (44 ms for e_conv1's
bf16[24,128^3,5] dgrad).

THE REWRITE (exact, pure XLA — no kernel):

    y[o] = sum_t w[t] x[s*o + t - pad_lo]          (SAME, stride s)

decompose the input index i = s*u + p (phase p in [0,s)): each kernel tap
t lands in exactly one phase p(t) = (t - pad_lo) mod s at offset
q(t) = floor((t - pad_lo) / s). Split x into its s^3 phase grids (one
reshape+transpose — channels-minor, cheap on TPU), fold the phases into
channels (C -> S*C, S = prod(strides)), scatter w into a phase kernel
wp[q, (p,c), co], and run ONE dense stride-1 conv at the DECIMATED
resolution with explicit padding (-qmin, qmax) per dim:

    y = conv(x_phases, wp, stride 1)               (identical values)

Why this maps better to the hardware:
  * the conv runs at 64^3 instead of 128^3 with s=2: 1/8 the positions,
    8x the input channels — same MACs, but contiguous 128-lane-friendly
    K instead of strided window reads;
  * its data grad is ANOTHER dense stride-1 conv at 64^3 (the transpose
    of a stride-1 conv) — the 128^3 input-dilated dgrad disappears; the
    phase un-split adjoint is the same free reshape/transpose;
  * the weight grad contracts at 64^3 over s^3-fold channels — a fatter,
    better-tiled GEMM than the strided-window wgrad.

Numerics: EXACT — the same multiplies and adds, reassociated only by the
conv's own accumulation order (fp32 accumulation either way). Pinned
against ``lax.conv_general_dilated`` in tests/test_layers.py.

Gating: ``nn.layers.PHASE_CONV3D`` ("auto" = TPU backend), decided by the
end-to-end A/B in benchmarks/texture_bench.py like the other dispatch
defaults.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "phase_conv3d",
    "phase_conv3d_supported",
    "phase_dgrad_conv3d",
]


def _same_pad_lo(n: int, k: int, s: int) -> int:
    """XLA SAME low padding for size n, kernel k, stride s."""
    out = -(-n // s)
    total = max((out - 1) * s + k - n, 0)
    return total // 2


def phase_conv3d_supported(x_shape, w_shape, stride) -> bool:
    """Strided 3D SAME conv whose every strided dim divides evenly."""
    if len(x_shape) != 5 or len(w_shape) != 5:
        return False
    if all(s == 1 for s in stride):
        return False  # nothing to rewrite
    if any(s < 1 or s > 4 for s in stride):
        return False
    if x_shape[4] != w_shape[3]:
        return False
    return all(n % s == 0 for n, s in zip(x_shape[1:4], stride))


def phase_conv3d(x: jnp.ndarray, w: jnp.ndarray, stride) -> jnp.ndarray:
    """``lax.conv_general_dilated(x, w, stride, 'SAME', NHWDC)`` computed
    as a dense stride-1 conv over the phase-decimated input (see module
    docstring). [B,H,W,D,C] @ [kh,kw,kd,C,K] -> [B,H/sh,W/sw,D/sd,K]."""
    b, h, wd, d, c = x.shape
    kh, kw, kd, ci, co = w.shape
    sh, sw, sd = stride
    assert phase_conv3d_supported(x.shape, w.shape, stride)

    # ---- per-dim tap -> (phase, offset) maps ----
    def dim_map(n, k, s):
        pad_lo = _same_pad_lo(n, k, s)
        qp = [((t - pad_lo) // s, (t - pad_lo) % s) for t in range(k)]
        qmin = min(q for q, _ in qp)
        qmax = max(q for q, _ in qp)
        return qp, qmin, qmax

    qph, qhmin, qhmax = dim_map(h, kh, sh)
    qpw, qwmin, qwmax = dim_map(wd, kw, sw)
    qpd, qdmin, qdmax = dim_map(d, kd, sd)

    # ---- phase-split input: [B, H/sh, W/sw, D/sd, sh*sw*sd*C] ----
    xp = x.reshape(b, h // sh, sh, wd // sw, sw, d // sd, sd, c)
    xp = xp.transpose(0, 1, 3, 5, 2, 4, 6, 7)
    xp = xp.reshape(b, h // sh, wd // sw, d // sd, sh * sw * sd * c)

    # ---- phase kernel: scatter each tap into its (q, p) slot ----
    # Built with numpy-style one-hot masks so the construction is linear
    # in w (autodiff pulls the wgrad straight back through it).
    nqh, nqw, nqd = qhmax - qhmin + 1, qwmax - qwmin + 1, qdmax - qdmin + 1
    wp = jnp.zeros((nqh, nqw, nqd, sh * sw * sd * c, co), w.dtype)
    for th in range(kh):
        qh, ph = qph[th]
        for tw in range(kw):
            qw, pw = qpw[tw]
            for td in range(kd):
                qd, pd = qpd[td]
                pidx = ((ph * sw) + pw) * sd + pd
                wp = wp.at[
                    qh - qhmin, qw - qwmin, qd - qdmin,
                    pidx * c : (pidx + 1) * c, :,
                ].set(w[th, tw, td])

    # ---- one dense stride-1 conv at the decimated resolution ----
    return lax.conv_general_dilated(
        xp,
        wp,
        window_strides=(1, 1, 1),
        padding=((-qhmin, qhmax), (-qwmin, qwmax), (-qdmin, qdmax)),
        dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
    )


# ---------------------------------------------------------------------------
# Hybrid: XLA forward, phase-space DATA gradient.
#
# The round-5 texture A/B showed the FULL phase rewrite loses on wide
# fan-in (5ch * 8 phases = 40): XLA's strided forward is better there,
# and its wgrad is fine — but its DATA GRADIENT lowers to an
# input-dilated conv back at the undecimated resolution, the single
# biggest traced op of the texture step (44 ms for e_conv1's
# bf16[24,128^3,5] dgrad). phase_conv3d == the strided conv EXACTLY (as
# linear maps in x), so the adjoint of the phase expression is a valid —
# and dense, decimated-resolution — implementation of the strided conv's
# dgrad. This wrapper takes XLA's forward and wgrad and ONLY swaps the
# dgrad.
# ---------------------------------------------------------------------------
@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def phase_dgrad_conv3d(x: jnp.ndarray, w: jnp.ndarray, stride) -> jnp.ndarray:
    """``lax.conv_general_dilated(x, w, stride, 'SAME', NHWDC)`` whose VJP
    computes the data grad through the phase-space adjoint (dense
    stride-1 conv at the decimated resolution) instead of XLA's
    input-dilated conv. Weight grad and forward are XLA's own."""
    return lax.conv_general_dilated(
        x, w, stride, "SAME", dimension_numbers=("NHWDC", "HWDIO", "NHWDC")
    )


def _pd_fwd(x, w, stride):
    return phase_dgrad_conv3d(x, w, stride), (x, w)


def _pd_bwd(stride, res, gy):
    x, w = res
    # gx: adjoint of the (identical) phase expression — jax.vjp of
    # phase_conv3d at x; the gw cotangent it also offers is unused and
    # DCE'd, because XLA's wgrad of the strided conv is kept instead.
    _, vjp = jax.vjp(lambda xx: phase_conv3d(xx, w, stride), x)
    (gx,) = vjp(gy)
    _, wvjp = jax.vjp(
        lambda ww: lax.conv_general_dilated(
            x, ww, stride, "SAME",
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        ),
        w,
    )
    (gw,) = wvjp(gy)
    return gx.astype(x.dtype), gw.astype(w.dtype)


phase_dgrad_conv3d.defvjp(_pd_fwd, _pd_bwd)
