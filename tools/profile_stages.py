#!/usr/bin/env python3
"""Per-stage TPU timing of the flagship step (RRTMG McICA SW+LW).

Times each pipeline stage in isolation with the differencing protocol
(two batch sizes, min-over-repeats, RTT cancels) so we know where the
time actually goes before optimizing.  Usage:

    python tools/profile_stages.py [ncol_small ncol_big niter]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from ecrad_tpu.config import GasModel, Solver
from ecrad_tpu.optics import rrtmg
from ecrad_tpu.solvers import mcica
from ecrad_tpu.solvers.cloud_generator import cloud_generator_device


def timed(fn, args_list, label, results):
    """min-over-repeats wall time of fn(*args), result fetched."""
    f = jax.jit(fn)
    t0 = time.time()
    out = f(*args_list[0])
    val = float(np.asarray(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
        jax.tree_util.tree_leaves(out), jnp.float32(0.0))))
    compile_t = time.time() - t0
    times = []
    for a in args_list[1:]:
        t0 = time.time()
        out = f(*a)
        float(np.asarray(jax.tree_util.tree_reduce(
            lambda acc, b: acc + jnp.sum(b.astype(jnp.float32)),
            jax.tree_util.tree_leaves(out), jnp.float32(0.0))))
        times.append(time.time() - t0)
    t = min(times)
    results.setdefault(label, {})
    results[label]["t"] = t
    results[label]["compile"] = compile_t
    print(f"  {label:40s} {t*1e3:9.2f} ms  (compile {compile_t:.1f}s, "
          f"chk {val:.3e})", flush=True)
    return t


def build_ctx(ncol):
    """All inputs + precomputed intermediates for stage isolation."""
    step, args = ge._build(ncol=ncol, dtype="float32")
    # re-derive the pieces _build wires together
    import ecrad_tpu.interface as iface
    return step, args


def main():
    ncol_small = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    ncol_big = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    niter = int(sys.argv[3]) if len(sys.argv) > 3 else 6

    print(f"devices: {jax.devices()}", flush=True)

    from ecrad_tpu.interface import radiation, _optical_properties
    import ecrad_tpu.interface as iface

    all_results = {}
    for ncol in (ncol_small, ncol_big):
        print(f"\n=== ncol={ncol} ===", flush=True)
        res = {}
        all_results[ncol] = res
        step, args = ge._build(ncol=ncol, dtype="float32")
        config = ge._build.__globals__  # not used
        # rebuild config/tables the same way
        from ecrad_tpu.config import Config, IceModel, LiquidModel
        from ecrad_tpu.data import DATA_DIR
        from ecrad_tpu.interface import setup_radiation

        # full step
        def variants(n):
            out = []
            for i in range(n + 1):
                cloud_i = dict(args[8])
                cloud_i["iseed"] = cloud_i["iseed"] + (i + 1)
                out.append(args[:8] + (cloud_i,) + args[9:])
            return out

        timed(step, variants(niter), "full_step", res)

        # Rebuild internals for stage isolation
        nam_kw = dict(
            liquid_model=LiquidModel.SOCRATES, ice_model=IceModel.FU,
            do_lw_derivatives=True, do_canopy_fluxes_sw=True,
            do_canopy_fluxes_lw=True, do_nearest_spectral_lw_emiss=True,
            i_lw_emiss_index=(1, 2, 1),
            lw_emiss_wavelength_bound=(8.0e-6, 13.0e-6),
            i_sw_albedo_index=(1, 2, 3, 4, 5, 6),
            sw_albedo_wavelength_bound=(0.25e-6, 0.44e-6, 0.69e-6,
                                        1.19e-6, 2.38e-6),
            use_aerosols=True, n_aerosol_types=12,
            i_aerosol_type_map=(-1, -2, -3, 7, 8, 9, -4, 10, 11, 11, -5,
                                14),
            use_general_cloud_optics=False, dtype_name="float32",
        )
        config = Config(**nam_kw)
        config, tables = setup_radiation(config, data_dir=DATA_DIR)
        (pressure_hl, temperature_hl, gas_mmr, cos_sza, skin_temperature,
         sw_albedo, sw_albedo_direct, lw_emissivity, cloud, aerosol) = args
        solar = 1366.0

        gdict = {name: gas_mmr[:, :, i] for name, i in
                 __import__("ecrad_tpu.constants",
                            fromlist=["GAS_INDEX"]).GAS_INDEX.items()
                 if name in ("h2o", "co2", "ch4", "n2o", "cfc11", "cfc12",
                             "hcfc22", "ccl4", "o3")}

        # stage: RRTMG gas optics (LW+SW)
        def gas_stage(phl, thl, gm, mu, skin):
            gd = {name: gm[:, :, i] for name, i in
                  __import__("ecrad_tpu.constants",
                             fromlist=["GAS_INDEX"]).GAS_INDEX.items()
                  if name in ("h2o", "co2", "ch4", "n2o", "cfc11",
                              "cfc12", "hcfc22", "ccl4", "o3")}
            return rrtmg.gas_optics(
                tables.gas["rrtmg"], phl, thl, gd, cos_sza=mu,
                do_lw=True, do_sw=True, skin_temperature=skin,
                solar_irradiance=solar,
                min_gas_od_lw=config.min_gas_od_lw,
                min_gas_od_sw=config.min_gas_od_sw)

        gv = []
        for i in range(niter + 1):
            gv.append((pressure_hl, temperature_hl + 0.001 * i, gas_mmr,
                       cos_sza, skin_temperature))
        timed(gas_stage, gv, "rrtmg_gas_optics(LW+SW)", res)

        # stage: optical properties (gas + aerosol + cloud optics)
        def optprops(phl, thl, gm, mu, skin, alb, albd, emis, cl, aer):
            return _optical_properties(
                config, tables, pressure_hl=phl, temperature_hl=thl,
                gas_mmr=gm, cos_sza=mu, skin_temperature=skin,
                sw_albedo=alb, sw_albedo_direct=albd, lw_emissivity=emis,
                solar_irradiance=solar, cloud=cl, aerosol=aer)

        ov = []
        for i in range(niter + 1):
            ov.append((pressure_hl, temperature_hl + 0.001 * i, gas_mmr,
                       cos_sza, skin_temperature, sw_albedo,
                       sw_albedo_direct, lw_emissivity, cloud, aerosol))
        timed(optprops, ov, "optical_properties(all)", res)

        # stage: cloud generator (SW + LW)
        pdf = tables.pdf_sampler

        def gen_stage(iseed, frac, op, fsd):
            a = cloud_generator_device(config, pdf, iseed, frac, op, fsd,
                                       config.n_g_sw)
            b = cloud_generator_device(config, pdf, iseed + 997, frac, op,
                                       fsd, config.n_g_lw)
            return a, b

        gv2 = []
        for i in range(niter + 1):
            gv2.append((cloud["iseed"] + i, cloud["fraction"],
                        cloud["overlap_param"], cloud["fractional_std"]))
        timed(gen_stage, gv2, "cloud_generator(SW+LW)", res)

        # precompute op once for solver stages
        op = jax.jit(optprops)(*ov[0])
        op = jax.tree_util.tree_map(
            lambda x: x if isinstance(x, jnp.ndarray) else x, op)
        od_sc_sw, tcc_sw = jax.jit(
            lambda s: cloud_generator_device(
                config, pdf, s, cloud["fraction"], cloud["overlap_param"],
                cloud["fractional_std"], config.n_g_sw))(cloud["iseed"])
        od_sc_lw, tcc_lw = jax.jit(
            lambda s: cloud_generator_device(
                config, pdf, s, cloud["fraction"], cloud["overlap_param"],
                cloud["fractional_std"], config.n_g_lw))(
                    cloud["iseed"] + 997)

        lw_emission = op["go"].lw_emission * (1.0 - op["lw_albedo_g"])

        def lw_stage(od_lw, od_sc, planck_hl, emis, ssa_lw, g_lw, clod,
                     clssa, clg, tcc, frac2, alb):
            return mcica.solver_mcica_lw(
                od_lw, ssa_lw, g_lw, clod, clssa, clg,
                tables.band_from_g_lw, od_sc, tcc, frac2,
                planck_hl, emis, alb,
                cloud_fraction_threshold=config.cloud_fraction_threshold,
                do_lw_cloud_scattering=config.do_lw_cloud_scattering,
                do_lw_aerosol_scattering=config.do_lw_aerosol_scattering,
                do_lw_derivatives=True)

        lv = []
        for i in range(niter + 1):
            lv.append((op["od_lw"] * (1.0 + 1e-5 * i), od_sc_lw,
                       op["go"].planck_hl, lw_emission, op["ssa_lw"],
                       op["g_lw_arr"], op["cl"]["od_lw"],
                       op["cl"]["ssa_lw"], op["cl"]["g_lw"], tcc_lw,
                       op["frac"], op["lw_albedo_g"]))
        timed(lw_stage, lv, "solver_mcica_lw", res)

        def sw_stage(od_sw, od_sc, ssa_sw, g_sw, clod, clssa, clg, tcc,
                     frac2, inc, mu, albd, albdir):
            return mcica.solver_mcica_sw(
                od_sw, ssa_sw, g_sw, clod, clssa, clg,
                tables.band_from_g_sw, od_sc, tcc, frac2, inc, mu,
                albd, albdir,
                cloud_fraction_threshold=config.cloud_fraction_threshold)

        sv = []
        for i in range(niter + 1):
            sv.append((op["od_sw"] * (1.0 + 1e-5 * i), od_sc_sw,
                       op["ssa_sw"], op["g_sw_arr"], op["cl"]["od_sw"],
                       op["cl"]["ssa_sw"], op["cl"]["g_sw"], tcc_sw,
                       op["frac"], op["go"].incoming_sw, cos_sza,
                       op["sw_albedo_diffuse_g"],
                       op["sw_albedo_direct_g"]))
        timed(sw_stage, sv, "solver_mcica_sw", res)

    # difference the two sizes
    print(f"\n=== differenced (per {ncol_big - ncol_small} cols) ===")
    dcol = ncol_big - ncol_small
    total = None
    for label in all_results[ncol_big]:
        dt = all_results[ncol_big][label]["t"] \
            - all_results[ncol_small][label]["t"]
        cps = dcol / max(dt, 1e-9)
        print(f"  {label:40s} {dt*1e3:9.2f} ms   {cps:12.0f} cols/s")
        if label == "full_step":
            total = cps
    print(f"\nfull-step throughput: {total:.0f} cols/s/chip")


if __name__ == "__main__":
    main()
