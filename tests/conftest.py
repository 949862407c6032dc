import os

# Tests run on the CPU backend with a virtual 8-device mesh so
# multi-chip sharding code paths compile and execute without TPUs.
# The container's axon sitecustomize force-registers the TPU backend
# and sets JAX_PLATFORMS=axon, so both the env var and the jax config
# must be overridden here (before any backend initializes).
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = "/root/reference"


def reference_path(*parts):
    return os.path.join(REFERENCE_ROOT, *parts)
