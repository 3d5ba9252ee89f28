import os

# Tests run on a virtual 8-device CPU mesh. The device-count flag must be
# set before the backend initializes; the platform choice must ALSO be
# forced via jax.config because the environment's TPU plugin (axon) wins
# over the JAX_PLATFORMS env var.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
