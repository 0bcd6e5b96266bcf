import os

# Tests must run everywhere (CI boxes without a TPU): force the CPU backend
# and fake an 8-device mesh so sharding logic is exercised for real.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# Persistent compilation cache makes repeat test runs fast.
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/safelife_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
