"""Driver entry-point contract tests."""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import __graft_entry__


def test_dryrun_multichip_8():
    __graft_entry__.dryrun_multichip(8)


def test_dryrun_multichip_2():
    __graft_entry__.dryrun_multichip(2)


def test_entry_traces():
    """entry() must be jit-traceable (abstract eval only — full 512^2
    compile is the driver's job and too slow for unit tests)."""
    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 512, 512, 1)
