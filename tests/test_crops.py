"""Crop-op tests vs straightforward numpy slicing oracles."""
import jax
import jax.numpy as jnp
import numpy as np

from rendernet_tpu.ops import crops


def _data(rng, voxel_dim=16, img_factor=4, channels=1):
    vox = rng.random((2, voxel_dim, voxel_dim, voxel_dim, 1), dtype=np.float32)
    img = rng.random(
        (2, voxel_dim * img_factor, voxel_dim * img_factor, channels),
        dtype=np.float32,
    )
    return jnp.asarray(vox), jnp.asarray(img)


def test_random_crop_shapes_and_alignment(rng):
    vox, img = _data(rng)
    key = jax.random.PRNGKey(3)
    cv, ci = crops.random_crop_voxel_image(key, vox, img, patch_size=8)
    assert cv.shape == (2, 8, 8, 16, 1)
    assert ci.shape == (2, 32, 32, 1)
    # Crop content must be a contiguous window of the source at aligned offsets
    offsets = np.asarray(crops.random_crop_offsets(key, 16, 8))
    np.testing.assert_allclose(
        np.asarray(cv),
        np.asarray(vox)[:, offsets[0] : offsets[0] + 8, offsets[1] : offsets[1] + 8],
    )
    np.testing.assert_allclose(
        np.asarray(ci),
        np.asarray(img)[
            :, offsets[0] * 4 : offsets[0] * 4 + 32, offsets[1] * 4 : offsets[1] * 4 + 32
        ],
    )


def test_full_size_patch_is_identity(rng):
    vox, img = _data(rng)
    cv, ci = crops.random_crop_voxel_image(jax.random.PRNGKey(0), vox, img, 16)
    assert cv is vox and ci is img


def test_random_crop_is_jittable(rng):
    vox, img = _data(rng)

    @jax.jit
    def f(key, v, i):
        return crops.random_crop_voxel_image(key, v, i, patch_size=4)

    cv, ci = f(jax.random.PRNGKey(1), vox, img)
    assert cv.shape == (2, 4, 4, 16, 1)
    assert ci.shape == (2, 16, 16, 1)


def test_four_way_crop_synchronized(rng):
    vox, img = _data(rng, channels=3)
    tex = jnp.asarray(rng.random((2, 16, 16, 16, 4), dtype=np.float32))
    normal = jnp.asarray(rng.random((2, 64, 64, 3), dtype=np.float32))
    key = jax.random.PRNGKey(9)
    cv, ct, ci, cn = crops.random_crop_voxel_texture_image_normal(
        key, vox, tex, img, normal, patch_size=8
    )
    offsets = np.asarray(crops.random_crop_offsets(key, 16, 8))
    np.testing.assert_allclose(
        np.asarray(ct),
        np.asarray(tex)[:, offsets[0] : offsets[0] + 8, offsets[1] : offsets[1] + 8],
    )
    assert cn.shape == (2, 32, 32, 3)


def test_center_crops(rng):
    vox, img = _data(rng)
    cv, ci = crops.center_crop_voxel_image(vox, img, 8)
    np.testing.assert_allclose(np.asarray(cv), np.asarray(vox)[:, 4:12, 4:12])
    np.testing.assert_allclose(np.asarray(ci), np.asarray(img)[:, 16:48, 16:48])


def test_center_pad_cube():
    x = np.ones((3, 5, 4))
    padded = crops.center_pad_cube(x)
    assert padded.shape == (5, 5, 5)
    assert padded.sum() == x.sum()
    assert padded[1:4, :, 0:4].sum() == x.sum()
