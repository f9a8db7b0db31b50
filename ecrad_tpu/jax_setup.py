"""JAX runtime configuration helpers.

Enables (a) the persistent compilation cache so repeat driver/bench/test
runs skip the 20-120s XLA compiles (the reference's setup is
milliseconds — radiation_interface.F90:37 — so cold-compile cost must be
one-time), and (b) HIGHEST default matmul precision: the TPU default
lowers f32 dots to bf16 passes, which pushes the surface-albedo mapping
and band reductions past the reference's single-precision flux
thresholds (LW/SW 0.5 W m-2, test/ifs/CMakeLists.txt:15-18).  All dots
in this framework are tiny or interpolation matmuls where full f32
accuracy is required, so HIGHEST costs nothing measurable."""

from __future__ import annotations

import os

_DONE = False


def enable_persistent_cache(cache_dir: str = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = (cache_dir
                 or os.environ.get("ECRAD_TPU_JAX_CACHE")
                 or os.path.expanduser("~/.cache/ecrad_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without these flags
    jax.config.update("jax_default_matmul_precision", "highest")
    _DONE = True
