"""Driver-contract test for __graft_entry__.dryrun_multichip.

Round-1 failed its MULTICHIP check because the driver imports the module and
calls dryrun_multichip() directly — in a process whose default jax platform
is the remote axon TPU — while the CPU forcing lived only in the __main__
guard and tests/conftest.py. This test reproduces the driver's calling
convention exactly: a FRESH python process (no conftest, XLA_FLAGS /
JAX_PLATFORMS scrubbed from the env) that imports the module and calls the
function. Reference equivalent: DDP launch correctness,
/root/reference/tools/train_net.py:476-480,529-536.
"""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_like_the_driver():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "WEAKCUBE_PLATFORM",
                        "_WEAKCUBE_DRYRUN_CHILD")}
    r = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, %r); "
         "import __graft_entry__ as g; g.dryrun_multichip(8)" % REPO],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    assert "dryrun_multichip(8): ok" in r.stdout
