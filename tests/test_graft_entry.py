"""Driver entry-point contract: entry() compiles; dryrun_multichip bootstraps.

Round-1 regression: the driver calls dryrun_multichip(8) from a host with ONE
real device; the check must re-exec itself onto a virtual CPU mesh instead of
asserting on device count (MULTICHIP_r01.json failure).
"""

import jax
import pytest

import __graft_entry__ as graft


@pytest.mark.slow
def test_entry_compiles():
    fn, args = graft.entry()
    recon, loss = jax.jit(fn)(*args)
    assert recon.shape == args[1].shape
    assert jax.numpy.isfinite(loss)


@pytest.mark.slow
def test_dryrun_inline_on_virtual_mesh():
    # Test env has 8 virtual CPU devices -> the inline path runs directly.
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_bootstraps_subprocess_when_devices_insufficient(monkeypatch):
    # Simulate the driver's 1-device host: the check must spawn a subprocess
    # with a forced virtual mesh rather than assert.
    one = jax.devices()[:1]
    monkeypatch.setattr(graft.jax, "devices", lambda *a, **k: one)
    graft.dryrun_multichip(4)
