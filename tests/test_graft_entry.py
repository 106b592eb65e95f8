"""Driver-contract pins for __graft_entry__.

Round-1 failure mode: the driver called ``dryrun_multichip(8)`` from an
environment where the axon sitecustomize had claimed the single real TPU, so
only 1 device was visible and ``make_mesh`` raised.  The entry point is now
environment-self-sufficient (re-execs under a forced n-virtual-CPU backend);
this test calls it from exactly such a hostile 1-device environment.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_survives_one_device_caller_env():
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    # No xla_force_host_platform_device_count: the caller sees ONE device.
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; assert len(jax.devices()) == 1, jax.devices();"
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        capture_output=True, text=True, timeout=1500, cwd=REPO, env=env,
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    assert "mesh={'dp': 4, 'fsdp': 2} ok" in r.stdout
