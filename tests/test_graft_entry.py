"""Driver-contract tests for ``__graft_entry__``.

``dryrun_multichip`` must work in a *fresh* interpreter where the
environment's sitecustomize pins ``JAX_PLATFORMS=axon`` — exactly how the
driver invokes it.  The in-process pytest environment cannot replicate that
(conftest pre-initializes an 8-device CPU backend), so the real check runs
in a subprocess.  Round-1 regression: ``jax.local_device_count()`` was
called before the CPU-topology config updates, initializing the axon
backend and making the fallback unreachable (MULTICHIP_r01.json rc=1).
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_fresh_subprocess():
    """Replicates the driver exactly: fresh interpreter, no conftest."""
    env = dict(os.environ)
    # keep compiles fast + cached, but do NOT set JAX_PLATFORMS: the point
    # is that dryrun_multichip itself must defeat the sitecustomize pin
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed in fresh subprocess\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip OK" in proc.stdout


def test_dryrun_multichip_inprocess_backend_already_up():
    """With a backend already initialized (pytest conftest), the config
    updates raise internally but the dryrun must still succeed on the
    pre-configured 8-device CPU mesh."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    import jax

    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    assert out.x.shape == (4096,)
