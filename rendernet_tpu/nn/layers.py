"""Functional NN layer library with TF-scope-compatible parameter naming.

Capability-parity target: ``tools/layer_util.py`` (conv2d/conv3d and
transposes :147-309, prelu :27, res blocks :60-121, projection_unit :8-22,
fully_connected :311, keep_prob dropout gate :124). The design is fresh and
TPU-idiomatic:

  * Layers are pure functions; parameters live in a flat ``{path: array}``
    dict (a valid jit/pjit pytree). Paths mirror TF variable scopes
    ("encoder/e_conv1/e_conv1/weights"), so importing the reference's
    ``.npz`` weight dumps is a key translation, not a graph surgery.
  * A tiny two-mode ``Module`` context builds params on a seeded init pass
    and fetches them on apply — one model definition, no framework dep.
  * Layouts are channels-last (NHWC / NDHWC, HWIO kernels) — XLA:TPU's
    preferred convolution layouts; compute dtype is configurable so the hot
    conv stacks can run bf16 on the MXU with fp32 params.
"""
from __future__ import annotations

import contextlib
import functools
import itertools
from typing import Callable, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from jax import lax

from rendernet_tpu.nn import init as initializers
from rendernet_tpu.ops import pallas_conv2d, pallas_conv3d, phase_conv

Params = Dict[str, jnp.ndarray]

# "Save pre-activations only": the res blocks' second conv normally makes
# standard AD save BOTH the conv1 pre-activation z (for the PReLU VJP) and
# the PReLU output y (for conv2's weight grad) — 2 of the 3 saved tensors
# per block. ``_act_conv`` below fuses activation+conv2 into one custom-VJP
# unit whose residuals are (z, alpha, w2) only; the backward recomputes
# y = act(z) (one elementwise op, never a convolution) before forming the
# weight grad. Cuts res-stack activation memory ~33% with the same math.
#
# WHY a custom VJP and not jax.checkpoint(policy=save_only_these_names):
# measured on TPU (round 4), the per-block checkpoint regions cost ~16%
# step time at patch 64 (294 -> 348 ms) with byte-identical conv counts —
# the remat regions' optimization barriers split XLA's fusions. The custom
# VJP expresses the identical recompute with no region boundaries.

__all__ = [
    "Module",
    "prelu",
    "lrelu",
    "conv2d",
    "conv3d",
    "conv2d_transpose",
    "conv3d_transpose",
    "fully_connected",
    "res_block_2d",
    "res_block_3d",
    "res_block_stack",
    "projection_unit",
    "dropout",
]


class Module:
    """Two-mode parameter context.

    Init mode (``Module(rng=key)``): ``param()`` creates arrays from
    initializers, splitting the key per parameter. Apply mode
    (``Module(params=...)``): ``param()`` looks arrays up by scoped path and
    casts to ``compute_dtype``.
    """

    def __init__(
        self,
        rng: Optional[jax.Array] = None,
        params: Optional[Params] = None,
        compute_dtype=jnp.float32,
        train: bool = False,
        dropout_rng: Optional[jax.Array] = None,
    ):
        if (rng is None) == (params is None):
            raise ValueError("pass exactly one of rng= (init) or params= (apply)")
        self.initializing = params is None
        self.params: Params = {} if params is None else params
        self._rng = rng
        self._scope: list[str] = []
        self.compute_dtype = compute_dtype
        self.train = train
        self._dropout_rng = dropout_rng

    @contextlib.contextmanager
    def scope(self, name: str):
        self._scope.append(name)
        try:
            yield self
        finally:
            self._scope.pop()

    def path(self, name: str) -> str:
        return "/".join(self._scope + [name])

    def next_rng(self) -> jax.Array:
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def dropout_rng(self) -> jax.Array:
        if self._dropout_rng is None:
            raise ValueError("train-mode dropout requires dropout_rng")
        self._dropout_rng, sub = jax.random.split(self._dropout_rng)
        return sub

    def param(
        self,
        name: str,
        shape: Sequence[int],
        init_fn: Callable = initializers.xavier_uniform,
    ) -> jnp.ndarray:
        path = self.path(name)
        if self.initializing:
            if path in self.params:
                raise ValueError(f"duplicate parameter: {path}")
            value = init_fn(self.next_rng(), tuple(shape), jnp.float32)
            self.params[path] = value
        else:
            if path not in self.params:
                raise KeyError(f"missing parameter: {path}")
            value = self.params[path]
        return value.astype(self.compute_dtype)


# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------
def prelu(m: Module, x: jnp.ndarray, name: str = "alpha") -> jnp.ndarray:
    """Parametric ReLU with a per-channel trainable alpha initialized to 0."""
    alpha = m.param(name, (x.shape[-1],), initializers.zeros)
    return jnp.maximum(x, 0.0) + alpha * jnp.minimum(x, 0.0)


def lrelu(x: jnp.ndarray, leak: float = 0.2) -> jnp.ndarray:
    return jnp.maximum(x, leak * x)


# ---------------------------------------------------------------------------
# convolutions (channels-last, TF-layout kernels)
# ---------------------------------------------------------------------------
_DIMNUMS = {2: ("NHWC", "HWIO", "NHWC"), 3: ("NDHWC", "DHWIO", "NDHWC")}

# Depth-packed conv dispatch: "auto" enables it on TPU only (CPU tests keep
# XLA's reference lowering); True/False force it for tests.
DEPTH_PACK = "auto"

# Implicit-GEMM Pallas kernel for the 3x3x3 stride-1 convs of the 3D res
# stack (ops/pallas_conv3d.py). Preferred over depth packing when the shape
# fits its envelope: measured 4.8x faster fwd than the best XLA formulation
# at training shapes. Same "auto"/True/False gating as DEPTH_PACK.
PALLAS_CONV3D = "auto"

# Phase-space (space-to-depth) rewrite of the STRIDED encoder conv3ds
# (ops/phase_conv.py): exact math, one dense stride-1 conv at the
# decimated resolution instead of a strided conv at 128^3. Measured
# round 5 (full-512 train step, bf16, batch 24): +2.1% on the SHADER
# (21.54 vs 21.09 fps; 1-ch e_conv1 folds to an 8-ch dense conv) but
# -1.7% on the TEXTURE step when applied to ALL strided convs (its 5-ch
# e_conv1 folds to 40 channels — past the win region). True/"auto"
# therefore applies the rewrite only where the phase-folded fan-in
# ci*prod(stride) <= PHASE_MAX_FANIN; "all" removes the fan-in gate
# (the measured texture negative). Gated on texture is a wash (27.20 vs
# 27.42 full-512, within 6-step timing jitter; +0.4% patch-64), so the
# default is "auto" (= TPU backend) with the gate — the shader keeps
# its +2.1% and nothing regresses outside noise. Exact math either way
# (tests/test_layers.py phase-conv rows).
PHASE_CONV3D = "auto"
PHASE_MAX_FANIN = 16

# Winograd F(2x2,3x3) for the wide-channel 3x3 stride-1 convs: 2.25x
# fewer MXU MACs, exact to transform roundoff. False | "xla" | "pallas"
# (True == "xla" for back-compat). The "xla" expression (ops/winograd.py)
# is a MEASURED NEGATIVE on TPU — 2.2-3.1x slower than the conv, the
# transformed-activation HBM round-trip eats the MAC cut
# (benchmarks/results/winograd_bench_r4.json); "pallas" is the fused
# kernel (ops/pallas_winograd.py) that keeps the transforms in VMEM and
# measures 1.60x over the XLA conv at the res2 shape / 21.08 fps
# full-512. Default gated by the training-quality A/B
# (benchmarks/winograd_quality_ab.py, fixed round-5 protocol: stable lr
# + liveness-asserted arms — the earlier lr-1e-4 FAIL was an artifact of
# a saturation-dead comparison arm; postmortem in docs/performance.md,
# verdict artifact winograd_quality_ab_r5.json). Per-op numerics are
# bounded on-chip: ~1.7x the conv's bf16 rounding, no correctness bug
# (benchmarks/tpu_kernel_parity.py winograd checks).
WINOGRAD_2D = False

# Implicit-GEMM Pallas kernel for the wide-channel 3x3 stride-1 convs of the
# 2D res stacks (ops/pallas_conv2d.py). Same gating — but the default is
# OFF until the kernel has been compiled and timed on real TPU hardware:
# the tunnel was down when it landed, XLA is already near MXU
# speed-of-light on these shapes (docs/design.md), and the wgrad kernel's
# VMEM working set is tight. benchmarks/conv2d_kernel_bench.py measures
# kernel-vs-XLA and the end-to-end step with this forced on/off; flip to
# "auto" if it wins.
PALLAS_CONV2D = False


def _pallas2d_enabled() -> bool:
    if PALLAS_CONV2D != "auto":
        return PALLAS_CONV2D
    return jax.default_backend() == "tpu"


def _depth_pack_factor(x: jnp.ndarray, w: jnp.ndarray, stride) -> int:
    """Pack factor for the stride-1 odd-kernel 3D conv, or 1 if ineligible.

    WHY: the MXU is a 128x128 systolic array; a conv with out_channels=32
    leaves 3/4 of its lanes idle. Computing ``f`` depth-consecutive outputs
    per conv position widens the output-channel dim to ``f*co`` (128 lanes
    at f=4, co=32) for 2x the logical FLOPs (kernel depth kd -> kd+f-1).
    Measured on v5e (batch 24, 64^3, 32ch, bf16): 1.2x fwd / 1.1x fwd+bwd
    on the isolated conv; ~5% off the shader-net fwd+bwd step (403->382 ms).
    """
    if w.ndim != 5 or any(s != 1 for s in stride):
        return 1
    kh, kw, kd, ci, co = w.shape
    if kh % 2 == 0 or kw % 2 == 0 or kd % 2 == 0 or co >= 128:
        return 1
    d = x.shape[3]
    for f in (8, 4, 2):
        if co * f <= 128 and ci * f <= 128 and d % f == 0 and d > f:
            return f
    return 1


def _depth_packed_expr(x: jnp.ndarray, w: jnp.ndarray, f: int) -> jnp.ndarray:
    """Depth-packed SAME stride-1 3D conv: equals
    ``conv_general_dilated(x, w, (1,1,1), 'SAME')`` with MACs regrouped.

    The packed kernel holds the logical kernel at ``f`` depth offsets in
    disjoint output-channel blocks; a depth-stride-``f`` conv then emits
    ``f`` depth positions per step, and the [*, D/f, f*co] -> [*, D, co]
    reshape is free (channels-minor layout).
    """
    kh, kw, kd, ci, co = w.shape
    pc = kd // 2
    wp = jnp.zeros((kh, kw, kd + f - 1, ci, f * co), w.dtype)
    for j in range(f):
        wp = wp.at[:, :, j : j + kd, :, j * co : (j + 1) * co].set(w)
    y = lax.conv_general_dilated(
        x,
        wp,
        window_strides=(1, 1, f),
        padding=((kh // 2,) * 2, (kw // 2,) * 2, (pc, kd - 1 - pc)),
        dimension_numbers=_DIMNUMS[3],
    )
    b, a1, a2, dp, n = y.shape
    return y.reshape(b, a1, a2, dp * f, co)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _depth_packed_conv(x: jnp.ndarray, w: jnp.ndarray, f: int) -> jnp.ndarray:
    return _depth_packed_expr(x, w, f)


def _depth_packed_fwd(x, w, f):
    return _depth_packed_expr(x, w, f), (x, w)


def _depth_packed_bwd(f, res, gy):
    x, w = res
    # Data grad of a stride-1 SAME odd-kernel conv is the same conv of the
    # cotangent with the spatially-flipped, io-swapped kernel — run it
    # depth-packed too (XLA's own transpose conv would be lane-starved at
    # ci=32 again). Weight grad: XLA's weight-grad of the PACKED conv
    # (output-channel dim f*co = full lanes), pulled back through the
    # (linear) kernel packing by jax.vjp.
    wf = jnp.flip(w, axis=(0, 1, 2)).swapaxes(3, 4)
    gx = _depth_packed_expr(gy, wf, f)  # fwd eligibility bounds ci*f too
    _, wvjp = jax.vjp(lambda ww: _depth_packed_expr(x, ww, f), w)
    (gw,) = wvjp(gy)
    return gx.astype(x.dtype), gw.astype(w.dtype)


_depth_packed_conv.defvjp(_depth_packed_fwd, _depth_packed_bwd)


def _conv_op(x: jnp.ndarray, w: jnp.ndarray, stride, ndim: int) -> jnp.ndarray:
    """SAME conv, routed through the Pallas implicit-GEMM kernel or the
    depth-packed formulation when eligible."""
    pack = DEPTH_PACK if DEPTH_PACK != "auto" else jax.default_backend() == "tpu"
    plas = (
        PALLAS_CONV3D
        if PALLAS_CONV3D != "auto"
        else jax.default_backend() == "tpu"
    )
    if ndim == 3 and plas and pallas_conv3d.nc_conv3d_supported(
        x.shape, w.shape, tuple(stride)
    ):
        return pallas_conv3d.nc_conv3d(x, w)
    phase = (
        PHASE_CONV3D
        if PHASE_CONV3D != "auto"
        else jax.default_backend() == "tpu"
    )
    if ndim == 3 and phase and phase_conv.phase_conv3d_supported(
        x.shape, w.shape, tuple(stride)
    ):
        fanin = x.shape[-1]
        for s in stride:
            fanin *= s
        if phase == "all" or fanin <= PHASE_MAX_FANIN:
            return phase_conv.phase_conv3d(x, w, tuple(stride))
        # Wide fan-in: the FULL rewrite is a measured negative here, and
        # the hybrid (XLA fwd/wgrad + phase-space data grad,
        # phase_conv.phase_dgrad_conv3d) is ALSO a measured negative —
        # its phase-split intermediates push the texture full-512 step
        # over HBM (falls to batch 12, 21.6 vs 27.98 fps). Fall through
        # to the plain strided conv.
    if ndim == 3 and pack:
        f = _depth_pack_factor(x, w, stride)
        if f > 1:
            return _depth_packed_conv(x, w, f)
    if (
        ndim == 2
        and _pallas2d_enabled()
        and pallas_conv2d.wc_conv2d_supported(x.shape, w.shape, tuple(stride))
    ):
        return pallas_conv2d.wc_conv2d(x, w)
    if ndim == 2 and WINOGRAD_2D:
        if WINOGRAD_2D == "pallas":
            from rendernet_tpu.ops import pallas_winograd

            if pallas_winograd.wino_conv2d_supported(
                x.shape, w.shape, tuple(stride), dtype=x.dtype
            ):
                return pallas_winograd.wino_conv2d(x, w)
        else:
            from rendernet_tpu.ops import winograd

            if winograd.winograd3x3_supported(x.shape, w.shape, tuple(stride)):
                return winograd.winograd3x3(x, w)
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=tuple(stride),
        padding="SAME",
        dimension_numbers=_DIMNUMS[ndim],
    )


def _conv(
    m: Module,
    x: jnp.ndarray,
    out_channels: int,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    scope: str,
    ndim: int,
    use_bias: bool,
    weight_init: Callable,
) -> jnp.ndarray:
    with m.scope(scope):
        w = m.param(
            "weights",
            tuple(kernel_size) + (x.shape[-1], out_channels),
            weight_init,
        )
        # No preferred_element_type: its autodiff transpose rule mixes bf16
        # cotangents with fp32 operands in current JAX. XLA:TPU accumulates
        # bf16 convolutions in fp32 inside the MXU regardless.
        y = _conv_op(x, w, stride, ndim)
        if use_bias:
            b = m.param("biases", (out_channels,), initializers.constant(0.001))
            y = y + b
    return y.astype(m.compute_dtype)


def conv2d(
    m: Module,
    x: jnp.ndarray,
    out_channels: int,
    kernel_size: Sequence[int] = (4, 4),
    stride: Sequence[int] = (1, 1),
    scope: str = "conv2d",
    use_bias: bool = True,
    weight_init: Callable = initializers.xavier_uniform,
) -> jnp.ndarray:
    return _conv(m, x, out_channels, kernel_size, stride, scope, 2, use_bias, weight_init)


def conv3d(
    m: Module,
    x: jnp.ndarray,
    out_channels: int,
    kernel_size: Sequence[int] = (4, 4, 4),
    stride: Sequence[int] = (2, 2, 2),
    scope: str = "conv3d",
    use_bias: bool = True,
    weight_init: Callable = initializers.xavier_uniform,
) -> jnp.ndarray:
    return _conv(m, x, out_channels, kernel_size, stride, scope, 3, use_bias, weight_init)


def _deconv_s1_k4(x, w, ndim):
    """Adjoint of a SAME stride-1 K=4 conv, as a plain conv.

    Forward SAME K=4 pads (1, 2), so the adjoint is the flipped,
    io-swapped kernel with the mirrored explicit padding (2, 1):
    z[j] = sum_k w[k] g[j + 1 - k]."""
    wf = jnp.flip(w, axis=tuple(range(ndim))).swapaxes(ndim, ndim + 1)
    return lax.conv_general_dilated(
        x, wf, (1,) * ndim, ((2, 1),) * ndim, dimension_numbers=_DIMNUMS[ndim]
    )


def _deconv_s2_k4(x, w, ndim):
    """Adjoint of a SAME stride-2 K=4 conv as a sub-pixel conv: one
    stride-1 3-tap conv producing all 2^ndim output phases in channels,
    then a depth-to-space interleave.

    WHY: lax.conv_transpose lowers to a conv over the zero-dilated input,
    which XLA:TPU runs at ~13 TF/s (measured; the 512^2 deconv chain was
    an 11.5 ms/step pocket of the shader train step). The phase form is a
    dense stride-1 conv at the small spatial size — regular MXU work.

    Per-dim derivation (fwd SAME K=4 s=2 pads (1,1)):
      z[2m]   = w[1] g[m] + w[3] g[m-1]   -> 3-tap kernel [w3, w1, 0]
      z[2m+1] = w[2] g[m] + w[0] g[m+1]   -> 3-tap kernel [0, w2, w0]
    The ndim-D phase kernel is the outer product of the per-dim rules.
    ``w`` is TF-transpose layout: spatial + (out, in).
    """
    co, ci = w.shape[ndim], w.shape[ndim + 1]
    nph = 2 ** ndim
    # wp[t1..tn, ci, p*co + o]; per-dim tap tables: phase 0: t->k {0:3, 1:1},
    # phase 1: {1:2, 2:0}; all other taps zero.
    tap_k = ({0: 3, 1: 1}, {1: 2, 2: 0})
    wp = jnp.zeros((3,) * ndim + (ci, nph * co), w.dtype)
    for p in range(nph):
        bits = [(p >> (ndim - 1 - d)) & 1 for d in range(ndim)]
        for taps_ks in itertools.product(*[tap_k[b].items() for b in bits]):
            t_idx = tuple(t for t, _ in taps_ks)
            k_idx = tuple(k for _, k in taps_ks)
            wp = wp.at[t_idx + (slice(None), slice(p * co, (p + 1) * co))].set(
                jnp.moveaxis(w[k_idx], 0, 1)
            )
    z = lax.conv_general_dilated(
        x, wp, (1,) * ndim, "SAME", dimension_numbers=_DIMNUMS[ndim]
    )
    # depth-to-space: [B, s..., nph*co] -> [B, 2s..., co]
    b = x.shape[0]
    sp = x.shape[1 : 1 + ndim]
    z = z.reshape((b,) + sp + (2,) * ndim + (co,))
    for d in range(ndim):
        z = jnp.moveaxis(z, 1 + ndim + d, 1 + 2 * d + 1)
    return z.reshape((b,) + tuple(2 * s for s in sp) + (co,))


def _conv_transpose_op(x, w, stride, ndim):
    """TF-semantics transposed conv (SAME, out = in*stride), fast-pathed."""
    ks = w.shape[:ndim]
    if all(s == 1 for s in stride) and all(k == 4 for k in ks):
        return _deconv_s1_k4(x, w, ndim)
    if all(s == 2 for s in stride) and all(k == 4 for k in ks):
        return _deconv_s2_k4(x, w, ndim)
    return lax.conv_transpose(
        x, w, strides=tuple(stride), padding="SAME",
        dimension_numbers=_DIMNUMS[ndim], transpose_kernel=True,
    )


def _conv_transpose(
    m: Module,
    x: jnp.ndarray,
    out_channels: int,
    kernel_size: Sequence[int],
    stride: Sequence[int],
    scope: str,
    ndim: int,
    use_bias: bool,
    weight_init: Callable,
) -> jnp.ndarray:
    """Transposed conv with TF semantics: SAME padding and
    ``output_shape = input_shape * stride`` — i.e. exactly the adjoint of a
    SAME-padded forward conv (tf.nn.conv*_transpose). Kernel layout follows
    TF: spatial... + (out, in)."""
    with m.scope(scope):
        w = m.param(
            "weights",
            tuple(kernel_size) + (out_channels, x.shape[-1]),
            weight_init,
        )
        y = _conv_transpose_op(x, w, tuple(stride), ndim)
        if use_bias:
            b = m.param("biases", (out_channels,), initializers.constant(0.001))
            y = y + b
    return y.astype(m.compute_dtype)


def conv2d_transpose(
    m: Module,
    x: jnp.ndarray,
    out_channels: int,
    kernel_size: Sequence[int] = (4, 4),
    stride: Sequence[int] = (1, 1),
    scope: str = "conv2d_transpose",
    use_bias: bool = True,
    weight_init: Callable = initializers.xavier_uniform,
) -> jnp.ndarray:
    return _conv_transpose(
        m, x, out_channels, kernel_size, stride, scope, 2, use_bias, weight_init
    )


def conv3d_transpose(
    m: Module,
    x: jnp.ndarray,
    out_channels: int,
    kernel_size: Sequence[int] = (4, 4, 4),
    stride: Sequence[int] = (1, 1, 1),
    scope: str = "conv3d_transpose",
    use_bias: bool = True,
    weight_init: Callable = initializers.xavier_uniform,
) -> jnp.ndarray:
    return _conv_transpose(
        m, x, out_channels, kernel_size, stride, scope, 3, use_bias, weight_init
    )


def fully_connected(
    m: Module,
    x: jnp.ndarray,
    out_size: int,
    scope: str = "fully_connected",
    use_bias: bool = True,
    weight_init: Callable = initializers.normal(0.02),
) -> jnp.ndarray:
    with m.scope(scope):
        w = m.param("weights", (x.shape[-1], out_size), weight_init)
        y = jnp.matmul(x, w)
        if use_bias:
            b = m.param("biases", (out_size,), initializers.constant(0.001))
            y = y + b
    return y.astype(m.compute_dtype)


# ---------------------------------------------------------------------------
# composite blocks
# ---------------------------------------------------------------------------
def _act_apply(z: jnp.ndarray, alpha: jnp.ndarray) -> jnp.ndarray:
    """PReLU (alpha=0 == ReLU, with a dead alpha gradient)."""
    return jnp.maximum(z, 0.0) + alpha * jnp.minimum(z, 0.0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _act_conv(z, alpha, w, b, ndim):
    """activation -> SAME stride-1 odd-kernel conv -> +bias, as ONE unit
    whose VJP saves the PRE-activation only (see the note atop this
    section). Forward math is identical to ``prelu`` + ``_conv_op`` + b."""
    y = _act_apply(z, alpha)
    return _conv_op(y, w, (1,) * ndim, ndim) + b


def _act_conv_fwd(z, alpha, w, b, ndim):
    return _act_conv(z, alpha, w, b, ndim), (z, alpha, w)


def _act_conv_bwd(ndim, res, g):
    z, alpha, w = res
    ones = (1,) * ndim
    y = _act_apply(z, alpha)  # the ONLY recompute — elementwise, no conv
    # weight grad through the (fast-path-routed) conv expression, y fixed
    _, wvjp = jax.vjp(lambda ww: _conv_op(y, ww, ones, ndim), w)
    (gw,) = wvjp(g)
    bcast_axes = tuple(range(g.ndim - 1))
    gb = jnp.sum(g, axis=bcast_axes)
    # data grad of a SAME stride-1 odd-kernel conv: same conv with the
    # spatially-flipped, io-swapped kernel (exact adjoint; the guard in
    # res_block_* restricts the preact path to odd kernels)
    wf = jnp.flip(w, axis=tuple(range(ndim))).swapaxes(ndim, ndim + 1)
    gy = _conv_op(g, wf, ones, ndim)
    gz = jnp.where(z > 0, gy, alpha * gy)
    galpha = jnp.sum(gy * jnp.minimum(z, 0.0), axis=bcast_axes)
    return (gz.astype(z.dtype), galpha.astype(alpha.dtype),
            gw.astype(w.dtype), gb.astype(g.dtype))


_act_conv.defvjp(_act_conv_fwd, _act_conv_bwd)


def res_block_2d(
    m: Module,
    x: jnp.ndarray,
    out_channels: int,
    scope: str,
    kernel: Sequence[int] = (3, 3),
    activation: str = "prelu",
    preact: bool = False,
) -> jnp.ndarray:
    """conv -> activation -> conv, plus identity skip.

    ``activation='prelu'`` matches fresh-training blocks; ``'relu'`` matches
    the pretrained/npz-loaded blocks (tools/layer_util.py:91-121).
    ``preact`` routes activation+conv2 through the save-pre-activation-only
    custom VJP (see ``_act_conv``) — same math, ~33% less saved activation
    memory.
    """
    return _res_block(m, x, out_channels, scope, kernel, activation, preact, 2)


def _res_block(m, x, out_channels, scope, kernel, activation, preact, ndim):
    conv = conv2d if ndim == 2 else conv3d
    ones = (1,) * ndim
    with m.scope(scope):
        net = conv(m, x, out_channels, kernel, ones, scope="con1_3X3")
        use_preact = (
            preact and not m.initializing
            and all(k % 2 == 1 for k in kernel)
        )
        if use_preact:
            if activation == "prelu":
                alpha = m.param("alpha", (net.shape[-1],), initializers.zeros)
            else:
                alpha = jnp.zeros((net.shape[-1],), net.dtype)
            with m.scope("conv2_3x3"):
                w2 = m.param(
                    "weights",
                    tuple(kernel) + (net.shape[-1], out_channels),
                    initializers.xavier_uniform,
                )
                b2 = m.param("biases", (out_channels,),
                             initializers.constant(0.001))
            net = _act_conv(net, alpha, w2, b2, ndim).astype(m.compute_dtype)
        else:
            net = (prelu(m, net) if activation == "prelu"
                   else jnp.maximum(net, 0.0))
            net = conv(m, net, out_channels, kernel, ones, scope="conv2_3x3")
    return (net + x).astype(m.compute_dtype)


def res_block_3d(
    m: Module,
    x: jnp.ndarray,
    out_channels: int,
    scope: str,
    kernel: Sequence[int] = (3, 3, 3),
    activation: str = "prelu",
    preact: bool = False,
) -> jnp.ndarray:
    return _res_block(m, x, out_channels, scope, kernel, activation, preact, 3)


def res_block_stack(
    m: Module,
    x: jnp.ndarray,
    n_blocks: int,
    out_channels: int,
    scope_fmt: str,
    ndim: int = 2,
    kernel: Optional[Sequence[int]] = None,
    activation: str = "prelu",
    use_scan: bool = True,
    remat: bool = False,
    preact: bool = False,
) -> jnp.ndarray:
    """Apply ``n_blocks`` identical res blocks named ``scope_fmt.format(i)``
    (i = 1..n).

    In apply mode with ``use_scan`` the per-block parameters are stacked
    along a leading axis and the stack runs as ONE ``lax.scan`` — a single
    traced/compiled block body instead of ``n`` unrolled copies, cutting
    XLA compile time ~5x on the 25-block shader net with identical math and
    identical parameter naming (init mode always unrolls, so the flat
    per-block param paths — and therefore npz weight import — are
    unchanged). ``remat`` checkpoints the body (one block of activations
    live in the backward pass instead of ``n``). ``preact`` routes
    activation+conv2 through the save-pre-activation-only custom VJP
    (``_act_conv``): identical math, ~33% less saved activation memory,
    and the backward recompute is one elementwise activation per block —
    no convs. ``remat`` subsumes ``preact`` when both are set.
    """
    if kernel is None:
        kernel = (3,) * ndim
    block_fn = res_block_2d if ndim == 2 else res_block_3d
    if (
        not m.initializing
        and ndim == 2
        and tuple(kernel) == (3, 3)
        and x.shape[-1] == out_channels
        and _pallas2d_enabled()
        and pallas_conv2d.wc_conv2d_supported(
            x.shape, (3, 3, x.shape[-1], out_channels), (1, 1), obufs=2
        )
    ):
        # HWNC-resident stack: one transpose pair brackets the whole stack
        # and every conv runs the implicit-GEMM Pallas kernel in its native
        # layout (bias/PReLU/residual are elementwise — layout-agnostic).
        return _res_stack_hwnc(
            m, x, n_blocks, scope_fmt, activation, use_scan, remat
        )
    if m.initializing or not use_scan or n_blocks <= 1:
        for i in range(1, n_blocks + 1):
            fn = lambda y, i=i: block_fn(
                m, y, out_channels, scope=scope_fmt.format(i),
                kernel=kernel, activation=activation,
                preact=preact and not remat,
            )
            if remat and not m.initializing:
                fn = jax.checkpoint(fn)
            x = fn(x)
        return x

    cdt = m.compute_dtype

    def gather(rel: str) -> jnp.ndarray:
        return jnp.stack(
            [
                m.params[m.path(scope_fmt.format(i)) + "/" + rel]
                for i in range(1, n_blocks + 1)
            ]
        ).astype(cdt)

    xs = [gather("con1_3X3/weights"), gather("con1_3X3/biases")]
    has_prelu = activation == "prelu"
    if has_prelu:
        xs.append(gather("alpha"))
    xs += [gather("conv2_3x3/weights"), gather("conv2_3x3/biases")]
    ones = (1,) * ndim

    use_preact = preact and not remat and all(k % 2 == 1 for k in kernel)

    def body(h, ws):
        if has_prelu:
            w1, b1, al, w2, b2 = ws
        else:
            w1, b1, w2, b2 = ws
            al = None
        net = _conv_op(h, w1, ones, ndim) + b1
        if use_preact:
            alpha = al if al is not None else jnp.zeros(
                (net.shape[-1],), net.dtype
            )
            net = _act_conv(net, alpha, w2, b2, ndim)
        else:
            if has_prelu:
                net = jnp.maximum(net, 0.0) + al * jnp.minimum(net, 0.0)
            else:
                net = jnp.maximum(net, 0.0)
            net = _conv_op(net, w2, ones, ndim) + b2
        return (net + h).astype(cdt), None

    if remat:
        body = jax.checkpoint(body)
    x, _ = lax.scan(body, x.astype(cdt), tuple(xs))
    return x


def _res_stack_hwnc(
    m: Module,
    x: jnp.ndarray,
    n_blocks: int,
    scope_fmt: str,
    activation: str,
    use_scan: bool,
    remat: bool,
) -> jnp.ndarray:
    """Apply-mode res-block stack resident in the Pallas conv2d kernel's
    HWNC layout, with the block epilogues (bias, PReLU/ReLU, skip-add)
    fused into the kernels — the whole block is two pallas_calls with no
    separate elementwise passes. Identical math and parameter naming to the
    res_block_2d loop; supports both the unrolled and lax.scan forms."""
    cdt = m.compute_dtype
    has_prelu = activation == "prelu"
    names = ["con1_3X3/weights", "con1_3X3/biases"]
    if has_prelu:
        names.append("alpha")
    names += ["conv2_3x3/weights", "conv2_3x3/biases"]

    def fetch(i: int, rel: str) -> jnp.ndarray:
        return m.params[m.path(scope_fmt.format(i)) + "/" + rel].astype(cdt)

    def body(h, ws):
        if has_prelu:
            w1, b1, al, w2, b2 = ws
            net = pallas_conv2d.wc_conv2d_prelu_hwnc(h, w1, b1, al)
        else:
            w1, b1, w2, b2 = ws
            net = pallas_conv2d.wc_conv2d_relu_hwnc(h, w1, b1)
        net = pallas_conv2d.wc_conv2d_res_hwnc(net, w2, b2, h)
        return net.astype(cdt), None

    if remat:
        body = jax.checkpoint(body)
    xh = pallas_conv2d.nhwc_to_hwnc(x.astype(cdt))
    if use_scan and n_blocks > 1:
        xs = tuple(
            jnp.stack([fetch(i, nm) for i in range(1, n_blocks + 1)])
            for nm in names
        )
        xh, _ = lax.scan(body, xh, xs)
    else:
        for i in range(1, n_blocks + 1):
            xh, _ = body(xh, tuple(fetch(i, nm) for nm in names))
    return pallas_conv2d.hwnc_to_nhwc(xh)


def projection_unit(
    m: Module, x: jnp.ndarray, scope: str = "projection_unit"
) -> jnp.ndarray:
    """The learned 3D->2D projection: collapse (depth, channel) into channels
    then mix with a 1x1 conv + PReLU (tools/layer_util.py:8-22).

    ``[B, H, W, D, C] -> [B, H, W, D*C]``. The reshape is free on TPU
    (channels-minor layout); the 1x1 conv is a [D*C, D*C] matmul over H*W
    pixels — pure MXU work.
    """
    b, h, w, d, c = x.shape
    flat = x.reshape(b, h, w, d * c)
    with m.scope(scope):
        y = conv2d(m, flat, d * c, (1, 1), (1, 1), scope="Conv")
        y = prelu(m, y)
    return y


def dropout(m: Module, x: jnp.ndarray, keep_prob: float) -> jnp.ndarray:
    """Inverted dropout gated on train mode (reference keep_prob semantics:
    tools/layer_util.py:124-131 + tf.nn.dropout scaling)."""
    if not m.train or keep_prob >= 1.0:
        return x
    mask = jax.random.bernoulli(m.dropout_rng(), keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0).astype(x.dtype)
