#!/usr/bin/env python3
"""TPU throughput for the non-flagship BASELINE configurations.

Round-3 review item 3: BASELINE.json commits to per-config numbers for
"Tripleclouds + ecCKD" and "SPARTACUS 3D", but only the flagship
(RRTMG McICA) had a measured cols/s.  This runs each configuration
single-chip with the bench.py fetch-a-scalar protocol and prints one
JSON line per config.

Usage: python tools/bench_matrix.py [config ...]
Configs: mcica_rrtmg tripleclouds_rrtmg tripleclouds_ecckd
         spartacus_3d  (default: all)

Sizes are chosen per solver cost (SPARTACUS is ~10x McICA per column
in the reference too — its 3x3-region matrix exponentials dominate,
radiation_spartacus_sw.F90:755).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge

# (name, nam_overrides, ncol, block)
CONFIGS = {
    # flagship, for cross-checking against bench.py
    "mcica_rrtmg": (dict(), 6144, 2048),
    # deterministic Tripleclouds on RRTMG bands (test_tripleclouds golden
    # config, solvers/tripleclouds.py)
    "tripleclouds_rrtmg": (dict(
        sw_solver_name="Tripleclouds", lw_solver_name="Tripleclouds",
    ), 2048, 1024),
    # BASELINE config 4: Tripleclouds + ecCKD-32b gas optics
    # (configCY49R1_ecckd.nam analog; general cloud optics as the
    # reference uses with ecCKD)
    "tripleclouds_ecckd": (dict(
        sw_solver_name="Tripleclouds", lw_solver_name="Tripleclouds",
        gas_model_sw_name="ECCKD", gas_model_lw_name="ECCKD",
        use_general_cloud_optics=True,
        do_nearest_spectral_lw_emiss=False,
        use_aerosols=False, n_aerosol_types=0, i_aerosol_type_map=(),
    ), 2048, 1024),
    # McICA + ecCKD-32b: the gas model with 8x fewer g-points than the
    # flagship's RRTMG on the flagship solver (round-4 review item 4).
    # ncol=2048 unblocked measured fastest (block chaining adds
    # ~2.4 ms/block; larger single batches regress on the h2o conc-LUT
    # intermediate)
    "ecckd_mcica": (dict(
        gas_model_sw_name="ECCKD", gas_model_lw_name="ECCKD",
        use_general_cloud_optics=True,
        do_nearest_spectral_lw_emiss=False,
        use_aerosols=False, n_aerosol_types=0, i_aerosol_type_map=(),
    ), 2048, 2048),
    # BASELINE config 5: SPARTACUS 3D SW+LW, explicit entrapment
    # (configCY49R1 solver swap + do_3d_effects, test_spartacus pattern).
    # ncol=512 unblocked measured fastest per column (round-5: 2.8k
    # cols/s vs 2.0k blocked at 256, 2.5k at 1024)
    "spartacus_3d": (dict(
        sw_solver_name="SPARTACUS", lw_solver_name="SPARTACUS",
        do_3d_effects=True, do_sw_delta_scaling_with_gases=False,
    ), 512, 512),
}


def bench_one(name, overrides, ncol, block, niter=8):
    step, args = ge._build(ncol=ncol, dtype="float32",
                           block_size=block if ncol > block else None,
                           nam_overrides=_resolve(overrides))

    def fn_scalar(a):
        flux = step(*a)
        acc = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(flux):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
        return acc

    fn = jax.jit(fn_scalar)
    triv = jax.jit(lambda x: x + 1.0)
    float(np.asarray(triv(jnp.float32(0.0))))
    rtt = min(
        (lambda t0: (float(np.asarray(triv(jnp.float32(i)))),
                     time.time() - t0)[1])(time.time())
        for i in range(20))
    t0 = time.time()
    v = float(np.asarray(fn(args)))
    compile_t = time.time() - t0
    ts = []
    for _ in range(niter):
        t0 = time.time()
        float(np.asarray(fn(args)))
        ts.append(time.time() - t0)
    t = min(ts) - rtt
    print(json.dumps({
        "config": name,
        "cols_per_sec_per_chip": round(ncol / t, 1),
        "ncol": ncol, "block": block,
        "step_ms": round(t * 1e3, 2),
        "compile_seconds": round(compile_t, 1),
        "checksum": v,
    }), flush=True)


def _resolve(overrides):
    """Map namelist-style *_name keys to Config enum fields."""
    from ecrad_tpu.config import GasModel, Solver
    out = {}
    solvers = {"Tripleclouds": Solver.TRIPLECLOUDS,
               "SPARTACUS": Solver.SPARTACUS,
               "McICA": Solver.MCICA}
    for k, v in overrides.items():
        if k.endswith("_solver_name"):
            out[k[:-5]] = solvers[v]
        elif k.startswith("gas_model") and k.endswith("_name"):
            out[k[:-5]] = GasModel.ECCKD if v == "ECCKD" else GasModel.RRTMG
        else:
            out[k] = v
    return out


def main():
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        overrides, ncol, block = CONFIGS[name]
        ncol = int(os.environ.get("BENCH_NCOL", ncol))
        bench_one(name, overrides, ncol, block)


if __name__ == "__main__":
    main()
