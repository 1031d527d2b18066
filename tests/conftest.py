"""Test config: run on CPU with 8 virtual devices so distribution tests can
exercise real meshes without TPU hardware (the standard JAX trick)."""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the shared TPU
# tunnel); tests must not hold the chip or pay remote-compile round trips.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax  # noqa: E402  (import after env setup)

# sitecustomize (axon TPU tunnel) imports jax at interpreter start with
# JAX_PLATFORMS=axon already latched; override through the config API.
jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
