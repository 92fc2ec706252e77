"""Driver entry-point regression test (dryrun on the virtual 8-device mesh)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    import __graft_entry__ as g

    g.dryrun_multichip(5)


def test_dryrun_multichip_driver_env():
    """Regression for MULTICHIP_r01: the driver calls dryrun_multichip in a
    FRESH process with no conftest and no XLA_FLAGS device-count override —
    dryrun_multichip must self-provision the virtual CPU mesh."""
    import subprocess

    env = dict(os.environ)
    # strip every test-harness crutch so this matches the raw driver env
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=540)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip OK" in proc.stdout
