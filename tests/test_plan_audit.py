"""The physical-plan audit is part of the test suite (VERDICT r8 #1).

Round 8 closed with a "plan audit PASS" claim while `python
tools/explain_audit.py` failed on HEAD — a stale `_raw_minhash`
LeftSemi assert survived a measured revert because nothing forced the
audit to run at round close. This test runs the EXACT judge command as
a subprocess (own JVM, default session conf — so the AQE wide-start
session check is exercised too, which an in-process run under the
pytest session's local[4]/shuffle=4 conf could not honestly do) and
fails the suite whenever the audit would fail.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_plan_audit_passes_on_head():
    env = {k: v for k, v in os.environ.items() if k != "SPARK_GRAFT_SHUFFLE"}
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "explain_audit.py"), SF_DIR],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=540,
    )
    tail = "\n".join(proc.stdout.splitlines()[-60:])
    assert proc.returncode == 0, (
        f"tools/explain_audit.py exited {proc.returncode}\n--- stdout tail ---\n"
        f"{tail}\n--- stderr tail ---\n"
        + "\n".join(proc.stderr.splitlines()[-15:])
    )
    assert "PASS (0 failures)" in proc.stdout


def test_audit_registry_builders_resolve():
    """Every CHECKS / BOUNDED_WINDOWS key must have a builder — a renamed
    gate must break here (cheap, no Spark) rather than at audit runtime."""
    sys.path.insert(0, REPO)
    from tools import explain_audit as ea

    builders = ea.audit_builders()
    missing = [k for k in ea.CHECKS if k not in builders]
    missing += [k for k in ea.BOUNDED_WINDOWS if k not in builders]
    assert not missing, f"audit entries without builders: {missing}"
