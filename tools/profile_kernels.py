#!/usr/bin/env python3
"""Per-pallas-call device timing of the fused McICA solver sweeps.

Times each LW pass (P1 clear-dn, P2 up, P3 total-dn, deriv) and SW pass
(S1 direct, S2 up, S3 dn) of solvers/pallas_mcica.py in isolation with
realistic shapes, plus the full lw_fused/sw_fused, at kernel layout
(nlev, ng, ncolp).  Fetch-a-scalar protocol, trivial RTT subtracted.

Usage: python tools/profile_kernels.py [ncol]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ecrad_tpu.solvers import pallas_mcica


def timed(fn, *args, n=8):
    fn = jax.jit(fn)
    float(np.asarray(fn(*args)))
    ts = []
    for _ in range(n):
        t0 = time.time()
        float(np.asarray(fn(*args)))
        ts.append(time.time() - t0)
    return min(ts)


def rs(tree):
    acc = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return acc


def main():
    ncolp = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    nlev = 137
    rng = np.random.default_rng(0)

    triv = jax.jit(lambda x: x + 1.0)
    float(np.asarray(triv(jnp.float32(0.0))))
    rtt = min((lambda t0: (float(np.asarray(triv(jnp.float32(i)))),
                           time.time() - t0)[1])(time.time())
              for i in range(20))
    print(f"# ncolp={ncolp} nlev={nlev} rtt={rtt*1e3:.1f}ms "
          f"device={jax.devices()[0].device_kind}")

    def mk(*shape):
        return jnp.asarray(rng.uniform(0.05, 1.0, shape), jnp.float32)

    rows = []
    for tag, ng, nband in (("lw", 140, 16), ("sw", 112, 14)):
        gcounts = tuple(
            int(c) for c in np.diff(np.linspace(0, ng, nband + 1,
                                                dtype=int)))
        od = mk(nlev, ng, ncolp)
        ssa = mk(nlev, ng, ncolp) * 0.9
        g = mk(nlev, ng, ncolp) * 0.8
        odscal = mk(nlev, ng, ncolp)
        odc_b = mk(nlev, nband, ncolp)
        ssac_b = mk(nlev, nband, ncolp) * 0.9
        gc_b = mk(nlev, nband, ncolp) * 0.8
        mask = (mk(nlev, 1, ncolp) > 0.5).astype(jnp.float32)
        planck = mk(nlev + 1, ng, ncolp)
        emis = mk(ng, ncolp)
        alb = mk(ng, ncolp) * 0.3
        mu0 = mk(1, ncolp)
        inc = mk(ng, ncolp)

        if tag == "lw":
            t = timed(lambda *a: rs(pallas_mcica.lw_fused(
                *a, gcounts, True)),
                od, odc_b, ssac_b, gc_b, odscal, mask, planck, emis, alb)
            rows.append((f"lw_fused total (4 passes, deriv on)", t - rtt))
            t = timed(lambda *a: rs(pallas_mcica.lw_fused(
                *a, gcounts, False)),
                od, odc_b, ssac_b, gc_b, odscal, mask, planck, emis, alb)
            rows.append((f"lw_fused (3 passes, no deriv)", t - rtt))
        else:
            t = timed(lambda *a: rs(pallas_mcica.sw_fused(
                *a, gcounts, True)),
                od, ssa, g, odc_b, ssac_b, gc_b, odscal, mask, mu0, inc,
                alb, alb)
            rows.append((f"sw_fused total (3 passes)", t - rtt))

    print("\n| kernel | ms |")
    print("|---|---|")
    for name, t in rows:
        print(f"| {name} | {t*1e3:.2f} |")


if __name__ == "__main__":
    main()
