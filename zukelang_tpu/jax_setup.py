"""One-time JAX configuration for this package.

Enables the persistent compilation cache (multi-limb crypto kernels are
cheap to run but expensive to compile; the cache amortizes each compile to
once per machine).  Import for side effects.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "ZUKELANG_JAX_CACHE", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # very old jax without these flags
    pass


def force_cpu(n_devices: int = 8):
    """Route this process to the host CPU backend with n virtual devices.

    Needed because this image's sitecustomize pins jax_platforms to the
    axon TPU tunnel regardless of JAX_PLATFORMS.  Also disables the
    persistent compilation cache: XLA:CPU AOT entries bake in host machine
    features and reloading them on a different host can hang or SIGILL."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n_devices}").strip()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", None)
