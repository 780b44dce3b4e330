"""Test configuration: hermetic 8-device CPU mesh + compile cache.

The session environment pins JAX to the tunneled TPU via an `axon`
sitecustomize (PYTHONPATH) that registers the backend at interpreter start.
Backends initialize lazily, so overriding `jax_platforms` plus XLA_FLAGS
here — before any device is touched — still lands everything on a virtual
8-device CPU platform.
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")
# The reference Keras model (parity tests) needs legacy tf.keras; this must
# be set before the first tensorflow import anywhere in the session.
os.environ.setdefault("TF_USE_LEGACY_KERAS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent XLA compile cache: model-sized compiles are cached across runs.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_cpu_comp_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
