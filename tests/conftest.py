"""Test harness configuration.

Tests run on CPU with 8 virtual devices so that multi-chip sharding
(data/model mesh axes) is exercised without TPU hardware, mirroring how the
driver dry-runs the multichip path (see __graft_entry__.dryrun_multichip).

Exception: ``RENDERNET_TPU_TESTS=1`` leaves the backend alone so the
manual compiled-kernel lane (tests/test_tpu_kernels.py, marker ``tpu``)
can see the real chip.
"""
import os

_TPU_LANE = bool(os.environ.get("RENDERNET_TPU_TESTS"))

if not _TPU_LANE:
    # Tests run on CPU with 8 virtual devices. The env var alone is NOT
    # enough in the driver environment: a sitecustomize registers the TPU
    # PJRT plugin at interpreter start and rewrites the jax_platforms
    # config, so we both set the env var (for clean environments) and
    # override the config after import.
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not _TPU_LANE:
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert len(jax.devices()) == 8

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
