"""Host input-pipeline benchmark: chunk decode throughput.

Measures data_loader chunks/s on a synthetic 512px tar (the reference
training format) in three configurations:
  * sync + PIL decode   (reference behavior: tools/data_util.py:64)
  * sync + native decode (native/imgio.cc)
  * prefetch(depth=2) overlap while the consumer simulates device time

One JSON line per measurement.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main(step_ms: float = 300.0):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401

    from rendernet_tpu.data.loaders import data_loader
    from rendernet_tpu.data.prefetch import prefetch
    from rendernet_tpu.data.synthetic import make_synthetic_shader_tar
    from rendernet_tpu.io import native_img
    from rendernet_tpu.utils import image as image_utils

    tmp = "/tmp/pipeline_bench_data"
    tar, mdir = make_synthetic_shader_tar(
        tmp, ["/root/reference/binvox/chair.binvox"] * 4,
        poses_deg=tuple((az, 70) for az in range(0, 360, 30)),  # 48 entries
        img_res=512,
    )

    def run(native: bool, depth: int, simulate_step: float = 0.0):
        orig = image_utils.decode_image
        if not native:
            def pil_only(buf):
                image_utils._require_pil()
                import io as _io

                from PIL import Image

                with Image.open(_io.BytesIO(buf)) as im:
                    return np.asarray(im)

            image_utils.decode_image = pil_only
            # the tar reader imported the symbol at module load
            import rendernet_tpu.io.tar_archive as ta

            ta.decode_image = pil_only
        try:
            loader = data_loader(tar, mdir, batch_size=24, batches_chunk=1,
                                 flatten=True, img_res=512)
            loader = prefetch(loader, depth)
            t0 = time.perf_counter()
            n = 0
            for _chunk in loader:
                n += 1
                if simulate_step:
                    time.sleep(simulate_step)
            dt = time.perf_counter() - t0 - n * simulate_step
            return n, dt
        finally:
            if not native:
                image_utils.decode_image = orig
                import rendernet_tpu.io.tar_archive as ta

                ta.decode_image = orig

    import numpy as np  # noqa: F811

    assert native_img.available()
    for name, native, depth, sim in [
        ("sync_pil", False, 0, 0.0),
        ("sync_native", True, 0, 0.0),
        ("prefetch_native_overlap", True, 2, step_ms / 1000.0),
    ]:
        n, dt = run(native, depth, sim)
        print(json.dumps({
            "bench": name,
            "chunks": n,
            "ms_per_chunk_exposed": round(dt / n * 1000, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
