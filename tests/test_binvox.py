"""binvox codec tests, run against the 5 reference assets + roundtrips."""
import glob
import io
import os

import numpy as np
import pytest

from rendernet_tpu.io import binvox

ASSETS = sorted(glob.glob("/root/reference/binvox/*.binvox"))


def _reference_decode(path):
    """Independent minimal decoder used as oracle (RLE spec, xzy layout)."""
    with open(path, "rb") as f:
        assert f.readline().startswith(b"#binvox")
        dims = None
        while True:
            line = f.readline()
            if line.startswith(b"dim"):
                dims = [int(v) for v in line.split()[1:]]
            if line.startswith(b"data"):
                break
        raw = np.frombuffer(f.read(), dtype=np.uint8)
    flat = np.repeat(raw[::2], raw[1::2]).astype(bool)
    return flat.reshape(dims)


@pytest.mark.parametrize("path", ASSETS, ids=[os.path.basename(p) for p in ASSETS])
def test_read_matches_oracle(path):
    with open(path, "rb") as f:
        vox = binvox.read_as_3d_array(f)
    oracle_xzy = _reference_decode(path)
    assert vox.axis_order == "xyz"
    np.testing.assert_array_equal(vox.data, np.transpose(oracle_xzy, (0, 2, 1)))
    assert vox.data.shape == (64, 64, 64)
    assert vox.data.any()


@pytest.mark.parametrize("path", ASSETS[:2], ids=[os.path.basename(p) for p in ASSETS[:2]])
def test_write_roundtrip(path, tmp_path):
    with open(path, "rb") as f:
        vox = binvox.read_as_3d_array(f)
    out = tmp_path / "rt.binvox"
    binvox.save_binvox(vox.data, str(out))
    with open(out, "rb") as f:
        again = binvox.read_as_3d_array(f)
    np.testing.assert_array_equal(vox.data, again.data)


def test_write_roundtrip_random(rng):
    data = rng.random((16, 16, 16)) > 0.7
    buf = io.BytesIO()
    binvox.Voxels(data, [16, 16, 16], [0.0, 0.0, 0.0], 1.0, "xyz").write(buf)
    buf.seek(0)
    again = binvox.read_as_3d_array(buf)
    np.testing.assert_array_equal(data, again.data)


def test_long_run_encoding():
    # A constant grid forces runs > 255 and exercises the run-split path.
    data = np.ones((16, 16, 16), dtype=bool)
    buf = io.BytesIO()
    binvox.Voxels(data, [16, 16, 16], [0, 0, 0], 1.0, "xyz").write(buf)
    buf.seek(0)
    again = binvox.read_as_3d_array(buf)
    np.testing.assert_array_equal(data, again.data)


def test_sparse_roundtrip(rng):
    data = rng.random((12, 12, 12)) > 0.8
    sparse = binvox.dense_to_sparse(data)
    dense = binvox.sparse_to_dense(sparse, 12)
    np.testing.assert_array_equal(data, dense)


def test_coord_array(rng):
    path = ASSETS[0]
    with open(path, "rb") as f:
        dense = binvox.read_as_3d_array(f)
    with open(path, "rb") as f:
        coords = binvox.read_as_coord_array(f)
    rebuilt = binvox.sparse_to_dense(coords.data, coords.dims)
    np.testing.assert_array_equal(dense.data, rebuilt)


def test_native_codec_parity():
    """Native C++ codec (when buildable) matches the numpy codec exactly."""
    import pytest

    from rendernet_tpu.io import native

    if not native.available():
        pytest.skip("native toolchain unavailable")
    with open("/root/reference/binvox/chair.binvox", "rb") as f:
        buf = f.read()
    import io as _io

    ref = binvox.read_as_3d_array(_io.BytesIO(buf)).data
    np.testing.assert_array_equal(native.decode(buf), ref)
    dims, trans, scale = native.decode_header(buf)
    enc = native.encode(ref, trans, scale)
    np.testing.assert_array_equal(
        binvox.read_as_3d_array(_io.BytesIO(enc)).data, ref
    )
    batch = native.decode_batch([buf] * 4, dims)
    assert batch.shape == (4, 64, 64, 64)
    np.testing.assert_array_equal(batch[0].astype(bool), ref)


def test_decode_bytes_helper():
    with open("/root/reference/binvox/chair.binvox", "rb") as f:
        buf = f.read()
    import io as _io

    ref = binvox.read_as_3d_array(_io.BytesIO(buf)).data
    np.testing.assert_array_equal(binvox.decode_bytes(buf), ref)


# ---------------------------------------------------------------------------
# native PNG decoder (native/imgio.cc via io/native_img.py)
# ---------------------------------------------------------------------------
def test_native_png_decode_parity_synthetic():
    import io as _io

    from PIL import Image

    from rendernet_tpu.io import native_img

    if not native_img.available():
        pytest.skip("native imgio not built")
    rng = np.random.default_rng(0)
    for shape in [(37, 53), (64, 64, 3), (33, 41, 4), (128, 256, 3)]:
        arr = rng.integers(0, 256, size=shape, dtype=np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        got = native_img.decode_png(buf.getvalue())
        assert got is not None
        np.testing.assert_array_equal(got, arr)


def test_native_png_decode_parity_reference_assets():
    import glob
    import io as _io

    from PIL import Image

    from rendernet_tpu.io import native_img

    if not native_img.available():
        pytest.skip("native imgio not built")
    paths = glob.glob("/root/reference/data/*.png")
    assert paths
    for p in paths:
        data = open(p, "rb").read()
        pil = np.asarray(Image.open(_io.BytesIO(data)))
        got = native_img.decode_png(data)
        assert got is not None, p
        np.testing.assert_array_equal(got, pil, err_msg=p)


def test_native_png_decode_rejects_non_png():
    from rendernet_tpu.io import native_img

    if not native_img.available():
        pytest.skip("native imgio not built")
    assert native_img.decode_png(b"not a png at all") is None


def test_decode_image_uses_native_path_and_matches_pil():
    """utils.decode_image (the tar loader's decoder) must keep byte parity
    with PIL now that PNGs take the native path."""
    import io as _io

    from PIL import Image

    from rendernet_tpu.utils.image import decode_image

    rng = np.random.default_rng(1)
    arr = rng.integers(0, 256, size=(64, 48, 3), dtype=np.uint8)
    buf = _io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    np.testing.assert_array_equal(decode_image(buf.getvalue()), arr)


def test_native_png_decode_thread_safety():
    """Concurrent decodes (the prefetch thread + loader threads release the
    GIL in the C call) must be reentrant and correct."""
    import concurrent.futures
    import io as _io

    from PIL import Image

    from rendernet_tpu.io import native_img

    if not native_img.available():
        pytest.skip("native imgio not built")
    rng = np.random.default_rng(3)
    arrays, bufs = [], []
    for i in range(8):
        arr = rng.integers(0, 256, size=(96 + i, 64, 3), dtype=np.uint8)
        b = _io.BytesIO()
        Image.fromarray(arr).save(b, format="PNG")
        arrays.append(arr)
        bufs.append(b.getvalue())

    def work(i):
        for _ in range(5):
            got = native_img.decode_png(bufs[i])
            np.testing.assert_array_equal(got, arrays[i])
        return i

    with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
        assert sorted(ex.map(work, range(8))) == list(range(8))
