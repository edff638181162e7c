import os

# Tests run on CPU with an 8-device virtual mesh so sharding is exercised
# without TPU hardware; double precision matches the reference contract.
# Note: this environment force-registers a TPU platform plugin and overrides
# the JAX_PLATFORMS env var, so the platform must be pinned via jax.config.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
