"""The driver contract: dryrun_multichip must run on the virtual CPU mesh
regardless of what platform the environment provides.

Round-1 regression: the dry run initialized the environment's accelerator
plugin instead of forcing the CPU platform and crashed on a backend
version mismatch (MULTICHIP_r01.json ok=false).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_forces_cpu_mesh_in_clean_process():
    """Mimic the driver: fresh process, environment's own platform config
    (no CPU forcing from the caller side)."""
    env = dict(os.environ)
    # strip the test harness's own CPU forcing so the entry point must do it
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env.pop("_SFT_DRYRUN_CHILD", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    code = (
        "import __graft_entry__ as g; g.dryrun_multichip(8); "
        "print('DRYRUN_OK')"
    )
    result = subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "DRYRUN_OK" in result.stdout


def test_dryrun_multichip_in_process_on_existing_cpu_mesh():
    """Under the test harness the backend is already an 8-device CPU mesh;
    the dry run must detect that and run in-process."""
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g

        g.dryrun_multichip(8)
    finally:
        sys.path.remove(REPO)
