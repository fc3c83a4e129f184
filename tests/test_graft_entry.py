"""Guard the driver interface: __graft_entry__ must keep working."""

import importlib.util
from pathlib import Path

import jax


def _load():
    path = Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_is_abstractly_jittable():
    mod = _load()
    fn, args = mod.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (1, 64, 64, 4)


def test_dryrun_multichip_small_mesh():
    mod = _load()
    mod.dryrun_multichip(2)  # full sharded train step on a 2-device mesh
