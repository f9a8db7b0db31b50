#!/usr/bin/env python3
"""Benchmark: flagship configuration (RRTMG gas optics + McICA SW/LW +
aerosols, 137 levels — the CY49R1 operational setup) on one chip.

Prints one JSON line: columns/sec/chip vs the reference anchor of
268 columns/s (ecRad CPU driver on the same 32x137 case,
test/ifs/ecrad_meridian_default_out_REFERENCE.log; see BASELINE.md).

Timing protocol: each call reduces every output field to one scalar
inside jit and that scalar is fetched to the host, so the work provably
executes (on remote-execution backends, unfetched results may never
run and block_until_ready can return at submission).  Per-call time
includes a fixed dispatch/transfer round trip, so two batch sizes are
timed (min over repeats) and differenced — the RTT cancels, leaving
pure device compute for (ncol_big - ncol_small) columns.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_COLS_PER_SEC = 268.0   # ecRad reference log (BASELINE.md)


def main():
    ncol_small = int(os.environ.get("BENCH_NCOL_SMALL", "512"))
    ncol_big = int(os.environ.get("BENCH_NCOL", "6144"))
    niter = int(os.environ.get("BENCH_NITER", "8"))
    # NPROMA-style column blocking bounds the per-call HBM working set so
    # the default ncol=6144 fits the 16GB chip (ecrad_tpu.pipeline,
    # analog of driver/ifs_blocking.F90:328-331)
    block = int(os.environ.get("BENCH_BLOCK", "2048"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge

    def build(ncol):
        step, args = ge._build(ncol=ncol, dtype="float32",
                               block_size=block if ncol > block else None)

        def fn_scalar(*a):
            flux = step(*a)
            acc = jnp.float32(0.0)
            # reduce over EVERY output array so nothing is DCE'd
            for leaf in jax.tree_util.tree_leaves(flux):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc

        fn = jax.jit(fn_scalar)
        variants = []
        for i in range(niter + 1):
            cloud_i = dict(args[8])
            cloud_i["iseed"] = cloud_i["iseed"] + (i + 1)
            variants.append(args[:8] + (cloud_i,) + args[9:])
        return fn, variants

    def measure(ncol):
        fn, variants = build(ncol)
        t0 = time.time()
        v = float(np.asarray(fn(*variants[0])))      # compile + warm
        compile_t = time.time() - t0
        times = []
        for vv in variants[1:]:
            t0 = time.time()
            float(np.asarray(fn(*vv)))
            times.append(time.time() - t0)
        return min(times), compile_t, v

    t_small, c_small, v1 = measure(ncol_small)
    t_big, c_big, v2 = measure(ncol_big)

    dt = max(t_big - t_small, 1e-9)
    cols_per_sec = (ncol_big - ncol_small) / dt
    result = {
        "metric": "columns_per_second_per_chip",
        "value": round(cols_per_sec, 1),
        "unit": "cols/s (RRTMG McICA SW+LW, 137 levels, f32)",
        "vs_baseline": round(cols_per_sec / BASELINE_COLS_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(f"# ncol={ncol_small}/{ncol_big} t_small={t_small:.4f}s "
          f"t_big={t_big:.4f}s dt={dt:.4f}s "
          f"compile={c_small:.1f}/{c_big:.1f}s "
          f"checksum={v1:.6g}/{v2:.6g} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
