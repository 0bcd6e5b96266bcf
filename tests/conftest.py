import os

# Tests must run everywhere (CI boxes without a TPU): force the CPU backend
# and fake an 8-device mesh so sharding logic is exercised for real.
#
# The TPU image registers its PJRT plugin from sitecustomize *before* this
# conftest runs and force-selects it via jax.config, so plain env-var
# defaults are not enough — override the config after import, and set
# XLA_FLAGS before the (lazy) backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

# Golden parity tests replay trajectories recorded from the reference C
# engine on specific reference levels; those levels are snapshotted here as
# fixtures so the suite is self-contained (no reference checkout needed).
os.environ["SAFELIFE_LEVELS"] = os.path.join(GOLDEN_DIR, "levels")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu"
assert len(jax.devices()) == 8, "8-device CPU mesh required for tests"

# Persistent compilation cache makes repeat test runs fast.
jax.config.update("jax_compilation_cache_dir", "/tmp/safelife_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
