"""Smoke test of the per-network complexity report
(scripts/bench_components.py --nets; reference model.py:323-421 harness).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_per_network_report_smoke():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "bench_components.py"),
         "--nets", "--tiny", "--shape", "32", "--batch", "2", "--iters", "1",
         "--platform", "cpu"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    rows = [json.loads(ln) for ln in proc.stdout.splitlines()
            if ln.startswith("{")]
    by_net = {r["net"]: r for r in rows}
    assert set(by_net) == {"net_D", "net_G", "net_T", "net_R"}
    for r in by_net.values():
        assert r["params"] > 0
        assert r["gmacs_per_slice"] > 0
        assert r["ms_per_call"] > 0
    # the scanned VarNet must use the analytic count (XLA cost analysis
    # counts scan bodies once regardless of trip count)
    assert by_net["net_R"]["macs_source"] == "analytic"
