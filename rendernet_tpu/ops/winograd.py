"""Winograd F(2x2, 3x3) convolution for the wide-channel res stacks.

WHY: the full-512 shader step is conv-schedule-bound with its 3x3
stride-1 res-stack convs already at ~93% of per-op roofline
(docs/performance.md round 4) — the only lever left on the conv band is
a FLOP-count cut. Winograd F(2x2,3x3) computes each 2x2 output tile
with 16 MACs-per-channel-pair instead of 36: 2.25x fewer MXU MACs.

DESIGN (pure XLA — no Pallas): the transform pipeline is expressed so
the heavy op is ONE batched GEMM the MXU loves:

    d: overlapping 4x4 input tiles, stride 2      [4,4, B,nh,nw, C]
    V = B^T d B   (elementwise-weighted sums)     [16, B*nh*nw, C]
    U = G w G^T   (tiny, per filter)              [16, C, K]
    M = V @ U     (one batched [16] GEMM)         [16, B*nh*nw, K]
    Y = A^T M A   -> 2x2 tiles -> interleave      [B, H, W, K]

Tile extraction uses 16 strided views (no gather); the transforms are
4-term linear combinations XLA fuses into the GEMM's prologue/epilogue.
The transformed activations are 4x the input bytes — the known Winograd
bandwidth tax — so the win condition is C large enough that the GEMM
dominates (the 512/1024-channel res stacks; never the 3D encoder).

Numerics: bf16 inputs amplify Winograd's transform rounding (the B^T d B
sums reach ~4x the data range). ``winograd3x3`` computes the transforms
in fp32 and feeds the GEMM operands in the caller's dtype, matching the
conv path's MXU-accumulation structure; any training default flip is
gated by an end-to-end quality A/B like the resample's
(docs/performance.md).

Autodiff: the whole pipeline is linear-in-x einsums, so jax.grad derives
the exact adjoints (the data grad is itself a Winograd-structured
computation; the weight grad contracts V against the output cotangent's
tile transform). No custom VJP is required for correctness.

Reference semantics anchor: the 3x3 stride-1 SAME convs of
tools/layer_util.py:91-121 (res blocks).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

__all__ = ["winograd3x3", "winograd3x3_supported"]

# F(2x2, 3x3) transform matrices (Lavin & Gray, arXiv:1509.09308).
_BT = np.array([
    [1, 0, -1, 0],
    [0, 1, 1, 0],
    [0, -1, 1, 0],
    [0, 1, 0, -1],
], np.float32)
_G = np.array([
    [1, 0, 0],
    [0.5, 0.5, 0.5],
    [0.5, -0.5, 0.5],
    [0, 0, 1],
], np.float32)
_AT = np.array([
    [1, 1, 1, 0],
    [0, 1, -1, -1],
], np.float32)


def winograd3x3_supported(x_shape, w_shape, stride) -> bool:
    """Envelope: SAME 3x3 stride-1 2D conv, channels wide enough that the
    batched GEMM dominates the 4x transform bandwidth tax."""
    if len(x_shape) != 4 or len(w_shape) != 4:
        return False
    if tuple(stride) != (1, 1) or w_shape[:2] != (3, 3):
        return False
    cin, cout = w_shape[2], w_shape[3]
    return cin >= 256 and cout >= 256


def winograd3x3(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """SAME stride-1 3x3 conv [B,H,W,C] @ [3,3,C,K] via F(2x2,3x3).

    Equals ``lax.conv_general_dilated(x, w, (1,1), 'SAME')`` up to
    transform roundoff (exact in real arithmetic; the transforms run in
    fp32)."""
    b, h, ww, c = x.shape
    k = w.shape[-1]
    ph, pw = -h % 2, -ww % 2
    nh, nw = (h + ph) // 2, (ww + pw) // 2
    # SAME halo (1 px) + pad H,W to even
    xp = jnp.pad(x, ((0, 0), (1, 1 + ph), (1, 1 + pw), (0, 0)))

    # d[r, s] = strided view of tap (r, s): [B, nh, nw, C]
    d = [
        [xp[:, r : r + 2 * nh : 2, s : s + 2 * nw : 2, :] for s in range(4)]
        for r in range(4)
    ]

    bt = _BT  # numpy: the 4-term combinations unroll at trace time
    f32 = jnp.float32

    # V[k1,k2] = sum_{r,s} BT[k1,r] BT[k2,s] d[r,s]  (fp32 sums)
    # first transform rows (k1, s), then columns (k1, k2): 2*4*4 fused
    # axpy chains instead of 16 4x4 double sums
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
    v = [
        [
            sum(
                rowt[k1][s] * float(bt[k2, s])
                for s in range(4)
                if bt[k2, s] != 0
            )
            for k2 in range(4)
        ]
        for k1 in range(4)
    ]
    vmat = jnp.stack(
        [v[k1][k2].reshape(b * nh * nw, c) for k1 in range(4) for k2 in range(4)]
    ).astype(x.dtype)  # [16, BT, C]

    # U = G w G^T: [16, C, K] (tiny; fp32 then cast)
    g = jnp.asarray(_G, f32)
    wf = w.astype(f32)
    u = jnp.einsum("ar,rscK,bs->abcK", g, wf, g)  # [4,4,C,K]
    umat = u.reshape(16, c, k).astype(w.dtype)

    m = jnp.einsum("tbc,tck->tbk", vmat, umat,
                   preferred_element_type=f32)  # [16, BT, K]
    m = m.reshape(4, 4, b, nh, nw, k)

    at = _AT
    # Y = A^T M A: [2, 2, B, nh, nw, K]
    rowo = [
        [
            sum(
                m[k1, k2] * float(at[p1, k1])
                for k1 in range(4)
                if at[p1, k1] != 0
            )
            for k2 in range(4)
        ]
        for p1 in range(2)
    ]
    y = [
        [
            sum(
                rowo[p1][k2] * float(at[p2, k2])
                for k2 in range(4)
                if at[p2, k2] != 0
            )
            for p2 in range(2)
        ]
        for p1 in range(2)
    ]
    # interleave the 2x2 output phases: [B, 2nh, 2nw, K]
    yt = jnp.stack([jnp.stack(rw, 0) for rw in y], 0)  # [2,2,B,nh,nw,K]
    yt = jnp.transpose(yt, (2, 3, 0, 4, 1, 5))  # [B, nh, 2, nw, 2, K]
    out = yt.reshape(b, 2 * nh, 2 * nw, k)
    return out[:, :h, :ww, :].astype(x.dtype)
