"""Test harness: force an 8-device virtual CPU mesh before JAX initialises.

SURVEY.md §4: the TPU answer to "test multi-node without a cluster" — all
tests run on CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8 so
sharding/collective paths execute for real.  Pallas kernels run in interpret
mode on CPU (handled inside the ops via backend checks / interpret fallbacks).
"""

import os

# Force CPU even when the shell presets JAX_PLATFORMS (e.g. 'axon' tunnels a
# real TPU — tests must not depend on it, and the tunnel is slow).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
