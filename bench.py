#!/usr/bin/env python3
"""Benchmark: flagship configuration (RRTMG gas optics + McICA SW/LW +
aerosols, 137 levels — the CY49R1 operational setup) on one chip.

Prints one JSON line: columns/sec/chip vs the reference anchor of
268 columns/s (ecRad CPU driver on the same 32x137 case,
test/ifs/ecrad_meridian_default_out_REFERENCE.log; see BASELINE.md).

The column batch is the meridian case tiled to NCOL columns; timing uses
the reference's nrepeat protocol (driver/ecrad_driver.F90:334-389): one
warmup (compile) pass, then NREPEAT timed full-domain sweeps.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_COLS_PER_SEC = 268.0   # ecRad reference log (BASELINE.md)


def main():
    ncol = int(os.environ.get("BENCH_NCOL", "2048"))
    nrepeat = int(os.environ.get("BENCH_NREPEAT", "20"))

    import jax

    import __graft_entry__ as ge

    step, args = ge._build(ncol=ncol, dtype="float32")
    fn = jax.jit(step)

    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_time = time.time() - t0

    # timed repeats
    t0 = time.time()
    for _ in range(nrepeat):
        out = fn(*args)
    jax.block_until_ready(out)
    elapsed = time.time() - t0

    cols_per_sec = ncol * nrepeat / elapsed
    result = {
        "metric": "columns_per_second_per_chip",
        "value": round(cols_per_sec, 1),
        "unit": "cols/s (RRTMG McICA SW+LW, 137 levels, f32)",
        "vs_baseline": round(cols_per_sec / BASELINE_COLS_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(f"# ncol={ncol} nrepeat={nrepeat} elapsed={elapsed:.3f}s "
          f"compile={compile_time:.1f}s "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
