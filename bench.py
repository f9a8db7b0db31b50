#!/usr/bin/env python3
"""Benchmark: flagship configuration (RRTMG gas optics + McICA SW/LW +
aerosols, 137 levels — the CY49R1 operational setup) on one chip.

Prints one JSON line: columns/sec/chip vs the reference anchor of
268 columns/s (ecRad CPU driver on the same 32x137 case,
test/ifs/ecrad_meridian_default_out_REFERENCE.log; see BASELINE.md).

Timing protocol: the repeat loop runs INSIDE jit as a lax.scan over
McICA seeds, reduced to one scalar that depends on every output field,
and the scalar is fetched to the host.  Two scan lengths are timed and
differenced, which cancels dispatch/transfer round-trip latency — on
remote-execution backends (axon tunnel) per-call latency is large and
unfetched results may never execute, so host-side repeat loops measure
submission, not compute.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_COLS_PER_SEC = 268.0   # ecRad reference log (BASELINE.md)


def main():
    ncol = int(os.environ.get("BENCH_NCOL", "2048"))
    nrep_short = int(os.environ.get("BENCH_NREPEAT_SHORT", "2"))
    nrep_long = int(os.environ.get("BENCH_NREPEAT", "12"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge

    step, args = ge._build(ncol=ncol, dtype="float32")

    def repeated(n):
        def body(carry, seed_offset):
            cloud_i = dict(args[8])
            cloud_i["iseed"] = cloud_i["iseed"] + seed_offset
            flux = step(*args[:8], cloud_i, *args[9:])
            # reduce over EVERY output array so nothing is dead-code
            # eliminated
            acc = carry
            for leaf in jax.tree_util.tree_leaves(flux):
                acc = acc + jnp.sum(leaf.astype(jnp.float32))
            return acc, ()

        def fn():
            acc, _ = jax.lax.scan(
                body, jnp.float32(0.0),
                jnp.arange(1, n + 1, dtype=jnp.int32))
            return acc

        return jax.jit(fn)

    fn_short = repeated(nrep_short)
    fn_long = repeated(nrep_long)

    def run_fetch(fn):
        t0 = time.time()
        v = float(np.asarray(fn()))
        return time.time() - t0, v

    # compile + warm both
    c_short, _ = run_fetch(fn_short)
    c_long, _ = run_fetch(fn_long)
    # timed
    t_short, v1 = run_fetch(fn_short)
    t_long, v2 = run_fetch(fn_long)
    t_short2, _ = run_fetch(fn_short)
    t_long2, _ = run_fetch(fn_long)
    t_short = min(t_short, t_short2)
    t_long = min(t_long, t_long2)

    dt = max(t_long - t_short, 1e-9)
    cols_per_sec = ncol * (nrep_long - nrep_short) / dt
    result = {
        "metric": "columns_per_second_per_chip",
        "value": round(cols_per_sec, 1),
        "unit": "cols/s (RRTMG McICA SW+LW, 137 levels, f32)",
        "vs_baseline": round(cols_per_sec / BASELINE_COLS_PER_SEC, 2),
    }
    print(json.dumps(result))
    print(f"# ncol={ncol} nrep={nrep_short}/{nrep_long} "
          f"t_short={t_short:.3f}s t_long={t_long:.3f}s "
          f"compile={c_short:.1f}/{c_long:.1f}s "
          f"checksum={v1:.6g}/{v2:.6g} "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)


if __name__ == "__main__":
    main()
