"""Phong shading tests vs independent numpy formulas and reference
semantics (tools/Phong_shading.py)."""
import math

import jax.numpy as jnp
import numpy as np
import pytest

from rendernet_tpu.ops import phong


def _normal_image(rng, b=2, h=8, w=8):
    n = rng.standard_normal((b, h, w, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return (n * 0.5 + 0.5).astype(np.float32)  # encoded as img = n/2 + 0.5


def test_phong_shading_diffuse_term(rng):
    img = _normal_image(rng)
    light_dir = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]], np.float32)
    light_col = np.ones((2, 3), np.float32)
    out = np.asarray(
        phong.phong_shading(jnp.asarray(img), jnp.asarray(light_dir),
                            jnp.asarray(light_col), k_diffuse=1.0)
    )
    normals = img - 0.5
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    expect = np.clip(
        np.maximum((normals * light_dir[:, None, None, :]).sum(-1, keepdims=True), 0),
        0, 1,
    ) * np.ones(3)
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_phong_composite_background_is_white(rng):
    # A pure-white input image is "background" for the white-background mask
    img = np.ones((1, 4, 4, 3), np.float32)
    out = np.asarray(
        phong.phong_composite(
            jnp.asarray(img), jnp.asarray([[0.0, 0.0, 1.0]]),
            jnp.ones((1, 3)), ambient=0.0, k_diffuse=1.0,
        )
    )
    np.testing.assert_allclose(out, 1.0, atol=1e-3)


def test_generate_light_pos_matches_reference_convention():
    # tf_generate_light_pos (Phong_shading.py:115-130): z-up spherical
    az = jnp.asarray([[0.0], [math.pi / 2]])
    out = np.asarray(phong.generate_light_pos(az, math.pi / 2, 2))
    np.testing.assert_allclose(out[0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(out[1], [0, 1, 0], atol=1e-6)
    out2 = np.asarray(phong.generate_light_pos(jnp.asarray([[0.0]]), 0.0, 1))
    np.testing.assert_allclose(out2[0], [0, 0, 1], atol=1e-6)


def test_np_generate_light_pos_y_up_demo_convention():
    # np generate_light_pos (Phong_shading.py:247-253): y-up, degrees
    out = phong.np_generate_light_pos(elevation=90, azimuth=90)
    np.testing.assert_allclose(out[0], [0, 0, -1], atol=1e-6)
    out = phong.np_generate_light_pos(elevation=0, azimuth=0)
    np.testing.assert_allclose(out[0], [0, 1, 0], atol=1e-6)


def test_np_and_jax_composites_agree(rng):
    img = _normal_image(rng, b=1)
    light_dir = np.array([[0.3, -0.5, 0.8]], np.float32)
    light_col = np.ones((1, 3), np.float32)
    jout = np.asarray(
        phong.phong_composite(
            jnp.asarray(img), jnp.asarray(light_dir), jnp.asarray(light_col),
            ambient=0.1, k_diffuse=0.9,
        )
    )
    nout = phong.np_phong_composite(
        img, light_dir, light_col, 0.1, 0.9, background_col="white"
    )
    np.testing.assert_allclose(jout, nout, atol=1e-4)


def test_light_gradient_flows():
    import jax

    img = jnp.asarray(_normal_image(np.random.default_rng(0), b=1))

    def loss(az):
        light = phong.generate_light_pos(az, 0.7, 1)
        shaded = phong.phong_composite(
            img, light, jnp.ones((1, 3)), 0.0, 1.0
        )
        return jnp.sum(shaded)

    g = jax.grad(loss)(jnp.asarray([[0.4]]))
    assert np.isfinite(np.asarray(g)).all()
    assert abs(float(g[0, 0])) > 0
