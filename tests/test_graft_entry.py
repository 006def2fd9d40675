"""Driver-contract tests for ``__graft_entry__``.

Round-1 shipped a red ``MULTICHIP_r01.json`` because ``dryrun_multichip``
assumed someone else had configured a multi-device platform, while the
driver runs it in a fresh process under the image default env
(``JAX_PLATFORMS=axon`` -> 1 real TPU chip). These tests invoke the entry
exactly the way the driver does — a fresh subprocess with the default
platform env, no conftest bootstrap — so that regression class cannot
ship silently again.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_env():
    """The image-default env the driver uses (undo conftest's overrides)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "axon"  # image default; dryrun must self-bootstrap
    flags = [
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    ]
    env["XLA_FLAGS"] = " ".join(flags)
    # the axon tunnel may be absent on pure-CPU runners; jax only consults
    # it if the entry fails to force the cpu platform, which is the bug
    # under test — a crash here is a genuine failure either way.
    return env


def test_dryrun_multichip_driver_identical():
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__\n__graft_entry__.dryrun_multichip(8)\n",
        ],
        cwd=REPO,
        env=_driver_env(),
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (
        f"driver-style dryrun_multichip(8) failed\n--- stdout ---\n"
        f"{proc.stdout}\n--- stderr ---\n{proc.stderr}"
    )
    assert "dryrun_multichip ok" in proc.stdout


def test_dryrun_multichip_in_process():
    """Same entry under the pytest 8-device CPU mesh (fast re-check)."""
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
