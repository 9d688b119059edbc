import os

# Tests run on CPU with a virtual 8-device mesh (the JAX-idiomatic fake
# multi-chip mechanism); bench.py and production entry points use the real
# TPU platform. NOTE: this environment pins JAX_PLATFORMS=axon and the plugin
# wins over the env var, so the config update below is the authoritative
# override.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
