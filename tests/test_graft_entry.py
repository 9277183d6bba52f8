"""Driver-contract regression tests for __graft_entry__.

Round 1 shipped a dryrun_multichip that asserted when the platform had
fewer devices than requested — the exact call pattern the driver uses.
This test reproduces the driver's environment (a single-device platform,
no forced host-device count) in a subprocess and requires the bootstrap
to succeed end-to-end.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_bootstraps_from_single_device():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    # the parent must see ONE device, like the driver's platform
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.path.dirname(__file__), ".jax_cache"
    )
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "1"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"

    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; assert len(jax.devices()) == 1, jax.devices();"
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8);"
         "print('BOOTSTRAP_OK')"],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1700,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "BOOTSTRAP_OK" in proc.stdout
    assert "loss_all=" in proc.stdout  # the driver looks for this line
