"""Fast-lane tf.nn oracle: the riskiest padding conventions, always on.

tests/test_tf_oracle.py carries the full oracle battery but is slow-marked
(TF mirrors of whole networks); the default test lane previously never
exercised ANY direct tf.nn comparison. These two cases cover the highest-
risk conventions — even-kernel strided SAME conv and even-kernel
conv2d_transpose with explicit output_shape (tools/layer_util.py:147-227)
— in a couple of seconds.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from rendernet_tpu.nn import layers  # noqa: E402
from rendernet_tpu.nn.layers import Module  # noqa: E402


def _ours(layer_fn, x, w, stride):
    mi = Module(rng=jax.random.PRNGKey(0))
    kernel = w.shape[: x.ndim - 2]
    out_ch = w.shape[-2] if "transpose" in layer_fn.__name__ else w.shape[-1]
    layer_fn(mi, jnp.asarray(x), out_ch, kernel, stride, scope="t",
             use_bias=False)
    (wkey,) = [k for k in mi.params if k.endswith("/weights")]
    m = Module(params={wkey: jnp.asarray(w)})
    return np.asarray(
        layer_fn(m, jnp.asarray(x), out_ch, kernel, stride, scope="t",
                 use_bias=False)
    )


def test_even_kernel_strided_conv2d_matches_tf(rng):
    """4x4 stride-2 SAME: TF pads asymmetrically (1 top/left, 2
    bottom/right at even sizes) — the convention most likely to silently
    shift pretrained-weight outputs."""
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    w = (rng.standard_normal((4, 4, 3, 5)) * 0.1).astype(np.float32)
    want = tf.nn.conv2d(x, w, strides=[1, 2, 2, 1], padding="SAME").numpy()
    np.testing.assert_allclose(_ours(layers.conv2d, x, w, (2, 2)), want,
                               atol=1e-5)


def test_even_kernel_conv2d_transpose_matches_tf(rng):
    """4x4 stride-2 transpose with explicit output_shape = in*stride —
    the deconv-chain convention (RenderNet_Shader.py:106-123); exercises
    the sub-pixel fast path (_deconv_s2_k4)."""
    x = rng.standard_normal((2, 8, 8, 5)).astype(np.float32)
    w = (rng.standard_normal((4, 4, 3, 5)) * 0.1).astype(np.float32)  # HWOI
    want = tf.nn.conv2d_transpose(
        x, w, output_shape=[2, 16, 16, 3], strides=[1, 2, 2, 1],
        padding="SAME",
    ).numpy()
    np.testing.assert_allclose(
        _ours(layers.conv2d_transpose, x, w, (2, 2)), want, atol=1e-5
    )
