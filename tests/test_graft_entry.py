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


def test_dryrun_multichip_fresh_subprocess_no_env():
    """The driver invokes dryrun_multichip in a process with NO special
    env vars; the function must force the virtual-CPU platform itself
    (round-1 failure mode: conftest's forcing masked a driver FAIL)."""
    import os
    import subprocess
    import sys

    path = Path(__file__).resolve().parent.parent / "__graft_entry__.py"
    code = (
        "import importlib.util\n"
        f"spec = importlib.util.spec_from_file_location('g', {str(path)!r})\n"
        "m = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(m)\n"
        "m.dryrun_multichip(4)\n"
    )
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME")
    }
    out = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, f"stderr:\n{out.stderr}\nstdout:\n{out.stdout}"
    assert "dryrun_multichip ok" in out.stdout
