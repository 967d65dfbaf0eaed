"""Driver-contract smoke: entry() compiles, dryrun_multichip runs a real
sharded fit_prior train step on the virtual mesh."""

import sys

import jax


def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    x_recon, aux = out
    assert x_recon.shape == (8, 28, 28, 1)
    assert aux.shape == ()


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)  # asserts internally on finite loss
