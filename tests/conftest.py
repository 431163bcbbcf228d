import os

# Tests run on a virtual 8-device CPU mesh with float64 (parity testing);
# real-TPU execution is exercised by bench.py / __graft_entry__.py.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# The axon TPU harness force-prepends its platform to JAX_PLATFORMS, so the
# env var alone is not enough — set the config explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
