"""Test configuration: force CPU with a virtual 8-device mesh.

This is the TPU-build equivalent of the reference's ddp_sim debugging config
(configs/trainer/ddp_sim.yaml — "simulate DDP on CPU"): multi-chip sharding
logic is exercised on 8 virtual CPU devices via
--xla_force_host_platform_device_count, per jax.sharding docs.

Must run before jax is imported anywhere.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The harness exports JAX_PLATFORMS=axon and the plugin can win over the env
# var set above; the config flag takes final precedence.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)
