"""Test configuration: run JAX on a virtual 8-device CPU mesh in f64.

Golden-file validation runs in float64 on CPU (matching the reference's
double-precision build and its tight nccmp thresholds,
test/ifs/CMakeLists.txt:15-21); TPU production runs are float32.
"""

import os

# Hard override: the environment presets JAX_PLATFORMS=axon (TPU tunnel) and
# sitecustomize.py imports jax at interpreter start, so the env var alone is
# ineffective here — use jax.config to force local CPU, where compiles are
# fast.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from ecrad_tpu.jax_setup import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

REFERENCE_DIR = "/root/reference"
DATA_DIR = os.path.join(REFERENCE_DIR, "data")
TEST_IFS_DIR = os.path.join(REFERENCE_DIR, "test", "ifs")
