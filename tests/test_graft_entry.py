"""The driver's entry points must stay green: single-chip compile check and
the full multichip dryrun (regions-DP sweep, batched perturbation schedule
mesh-vs-single byte-equality, tiny end-to-end phase_regions_batched over the
mesh, reads-sharded giant ascent with psum)."""

import importlib.util
import os

import jax
import pytest


def _load_entry():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", os.path.join(root, "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_jits():
    ge = _load_entry()
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape == (4, 64)


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    ge = _load_entry()
    ge.dryrun_multichip(8)
