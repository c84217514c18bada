"""The dependency-free TB events writer must produce files TensorBoard's
own stack can parse (TFRecord framing incl. masked CRC32C + Event/Summary
protos). Verified against tensorflow's summary_iterator, which rejects bad
CRCs with DataLossError."""
import os

import numpy as np
import pytest


def test_tb_events_readable_by_tensorflow(tmp_path):
    tf = pytest.importorskip("tensorflow")

    from rendernet_tpu.utils.tb import TBWriter

    w = TBWriter(str(tmp_path))
    w.scalar("loss", 1.5, step=1)
    w.scalar("loss", 0.75, step=2)
    w.scalar("valid_l1", 0.125, step=2)
    w.close()

    events = list(tf.compat.v1.train.summary_iterator(w.path))
    assert events[0].file_version == "brain.Event:2"
    scalars = [
        (e.step, v.tag, v.simple_value)
        for e in events[1:]
        for v in e.summary.value
    ]
    assert scalars == [
        (1, "loss", 1.5),
        (2, "loss", 0.75),
        (2, "valid_l1", 0.125),
    ]
    for e in events[1:]:
        assert e.wall_time > 0


def test_tb_crc32c_known_vectors():
    """CRC32C (Castagnoli) reference vectors (RFC 3720 appendix + classic
    test strings)."""
    from rendernet_tpu.utils.tb import _crc32c

    assert _crc32c(b"") == 0x00000000
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_rundir_writes_tb(tmp_path):
    tf = pytest.importorskip("tensorflow")

    from rendernet_tpu.train.config import TrainConfig
    from rendernet_tpu.train.loop import _RunDir

    cfg = TrainConfig(sample_save=str(tmp_path / "run"))
    run = _RunDir(cfg)
    run.log(step=3, epoch=0, loss=2.5)
    run.log(epoch=0, valid_l1=0.5)
    run.log(step=4, event="mesh", layout="data")  # strings skipped
    run.tb.close()

    tb_dir = str(tmp_path / "run" / "tb")
    files = os.listdir(tb_dir)
    assert len(files) == 1
    seen = []
    for e in tf.compat.v1.train.summary_iterator(
        os.path.join(tb_dir, files[0])
    ):
        for v in e.summary.value:
            seen.append((e.step, v.tag, v.simple_value))
    assert (3, "loss", 2.5) in seen
    assert (0, "valid_l1", 0.5) in seen
    assert all(tag != "layout" for _, tag, _ in seen)
