#!/usr/bin/env python3
"""Per-stage device timing of the flagship step on the real TPU.

Each pipeline stage (cloud generator, optical properties incl. RRTMG
gas optics, McICA LW, McICA SW) is jitted separately with realistic
inputs and timed with the fetch-a-scalar protocol (see bench.py); the
trivial-program RTT is subtracted.  Stage sums exceed the fused full
step because XLA fuses across stage boundaries in production — the
table attributes time, it does not add up exactly.

Usage:  python tools/profile_stages.py [ncol]
Writes a markdown table to stdout (redirect into docs/PERF.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=8):
    out = fn(*args)
    val = float(np.asarray(out))    # compile + warm
    times = []
    for _ in range(n):
        t0 = time.time()
        float(np.asarray(fn(*args)))
        times.append(time.time() - t0)
    return min(times), val


def reduce_scalar(tree):
    acc = jnp.float32(0.0)
    for leaf in jax.tree_util.tree_leaves(tree):
        if leaf is not None and hasattr(leaf, "astype"):
            acc = acc + jnp.sum(leaf.astype(jnp.float32))
    return acc


def main():
    ncol = int(sys.argv[1]) if len(sys.argv) > 1 else 2048

    import __graft_entry__ as ge
    from ecrad_tpu import pipeline
    from ecrad_tpu.interface import _optical_properties, radiation

    step, args = ge._build(ncol=ncol, dtype="float32")
    config, tables = step.config, step.tables
    from ecrad_tpu.interface import use_kernel_layout
    arg_names = ["pressure_hl", "temperature_hl", "gas_mmr", "cos_sza",
                 "skin_temperature", "sw_albedo", "sw_albedo_direct",
                 "lw_emissivity", "cloud", "aerosol"]
    kw = dict(zip(arg_names, args))
    cloud, aerosol = kw.pop("cloud"), kw.pop("aerosol")

    triv = jax.jit(lambda x: x + 1.0)
    float(np.asarray(triv(jnp.float32(0.0))))
    rtt = 1e9
    for i in range(20):
        t0 = time.time()
        float(np.asarray(triv(jnp.float32(i))))
        rtt = min(rtt, time.time() - t0)

    rows = []

    # 1) cloud generator (McICA sample, SW+LW)
    gen = jax.jit(lambda cl: reduce_scalar(
        pipeline.add_cloud_sample(config, tables, cl)))
    t, _ = timeit(gen, cloud)
    rows.append(("cloud_generator (SW+LW McICA sample)", t - rtt))

    # cloud with sample attached, reused below
    cloud_s = jax.jit(
        lambda cl: pipeline.add_cloud_sample(config, tables, cl))(cloud)
    cloud_s = jax.block_until_ready(cloud_s)

    # 2) optical properties (RRTMG gas optics + aerosol + cloud optics
    #    + albedo mapping)
    layout = "knl" if use_kernel_layout(config, tables, cloud) else "cln"
    print(f"# layout: {layout}")
    op_fn = jax.jit(lambda c, a, k: reduce_scalar(_optical_properties(
        config, tables, solar_irradiance=step.solar, cloud=c, aerosol=a,
        layout=layout, **k)))
    t, _ = timeit(op_fn, cloud_s, aerosol, kw)
    rows.append(("optical_properties (gas+aerosol+cloud optics)", t - rtt))

    # 2a-2d) sub-stages of optical_properties
    from ecrad_tpu import constants
    from ecrad_tpu.optics import aerosol as aerosol_mod
    from ecrad_tpu.optics import cloud as cloud_optics_mod
    from ecrad_tpu.optics import rrtmg

    gdict_of = lambda gm: {
        name: gm[:, :, constants.GAS_INDEX[name]]
        for name in ("h2o", "co2", "ch4", "n2o", "cfc11", "cfc12",
                     "hcfc22", "ccl4", "o3")}

    def gas_fn(do_lw, do_sw):
        def f(k):
            r = rrtmg.gas_optics(
                tables.gas["rrtmg"], k["pressure_hl"],
                k["temperature_hl"], gdict_of(k["gas_mmr"]),
                cos_sza=k["cos_sza"], do_lw=do_lw, do_sw=do_sw,
                skin_temperature=k["skin_temperature"],
                solar_irradiance=step.solar,
                min_gas_od_lw=config.min_gas_od_lw,
                min_gas_od_sw=config.min_gas_od_sw, layout=layout)
            return reduce_scalar(r._asdict())
        return jax.jit(f)

    t, _ = timeit(gas_fn(True, False), kw)
    rows.append(("  rrtmg gas_optics LW (taumol+planck, 140 g)", t - rtt))
    t, _ = timeit(gas_fn(False, True), kw)
    rows.append(("  rrtmg gas_optics SW (taumol, 112 g)", t - rtt))

    def aer_fn(k, a):
        p_fl = 0.5 * (k["pressure_hl"][:, :-1] + k["pressure_hl"][:, 1:])
        t_fl = 0.5 * (k["temperature_hl"][:, :-1]
                      + k["temperature_hl"][:, 1:])
        h2o_mmr = k["gas_mmr"][:, :, constants.GAS_INDEX["h2o"]]
        rh = h2o_mmr / aerosol_mod.h2o_sat_liq(p_fl, t_fl)
        aer = aerosol_mod.aerosol_band_properties(
            config, tables.aerosol, k["pressure_hl"],
            a["mixing_ratio"], rh)
        return reduce_scalar(aer)

    t, _ = timeit(jax.jit(aer_fn), kw, aerosol)
    rows.append(("  aerosol band properties (RH-dependent)", t - rtt))

    def cld_fn(k, cl):
        return reduce_scalar(cloud_optics_mod.cloud_optics(
            config, tables.cloud, k["pressure_hl"], k["temperature_hl"],
            cl["fraction"], cl["q_liq"], cl["q_ice"], cl["re_liq"],
            cl["re_ice"]))

    t, _ = timeit(jax.jit(cld_fn), kw, cloud_s)
    rows.append(("  cloud optics (liquid+ice LUT, per band)", t - rtt))

    op = jax.jit(lambda c, a, k: _optical_properties(
        config, tables, solar_irradiance=step.solar, cloud=c, aerosol=a,
        layout=layout, **k))(cloud_s, aerosol, kw)
    op = jax.block_until_ready(op)

    # 3) McICA LW / 4) McICA SW solvers from precomputed properties
    from ecrad_tpu.solvers import mcica

    def lw_fn(op_, cl):
        go = op_["go"]
        lw_emission = go.lw_emission * (1.0 - op_["lw_albedo_g"])
        return reduce_scalar(mcica.solver_mcica_lw(
            op_["od_lw"], op_["ssa_lw"], op_["g_lw_arr"],
            op_["cl"]["od_lw"], op_["cl"]["ssa_lw"], op_["cl"]["g_lw"],
            tables.band_from_g_lw, cl["od_scaling_lw"],
            cl["total_cloud_cover_lw"], op_["frac"], go.planck_hl,
            lw_emission, op_["lw_albedo_g"],
            do_lw_cloud_scattering=config.do_lw_cloud_scattering,
            do_lw_aerosol_scattering=config.do_lw_aerosol_scattering,
            do_lw_derivatives=config.do_lw_derivatives,
            layout=layout))

    t, _ = timeit(jax.jit(lw_fn), op, cloud_s)
    rows.append(("solver_mcica_lw (two-stream + adding)", t - rtt))

    def sw_fn(op_, cl, cos_sza):
        go = op_["go"]
        return reduce_scalar(mcica.solver_mcica_sw(
            op_["od_sw"], op_["ssa_sw"], op_["g_sw_arr"],
            op_["cl"]["od_sw"], op_["cl"]["ssa_sw"], op_["cl"]["g_sw"],
            tables.band_from_g_sw, cl["od_scaling_sw"],
            cl["total_cloud_cover_sw"], op_["frac"], go.incoming_sw,
            cos_sza, op_["sw_albedo_diffuse_g"],
            op_["sw_albedo_direct_g"], layout=layout))

    t, _ = timeit(jax.jit(sw_fn), op, cloud_s, kw["cos_sza"])
    rows.append(("solver_mcica_sw (two-stream + adding)", t - rtt))

    # full fused step for comparison
    full = jax.jit(lambda c, a, k: reduce_scalar(pipeline.radiation_step(
        config, tables, solar_irradiance=step.solar, cloud=c, aerosol=a,
        **k)))
    t, _ = timeit(full, cloud, aerosol, kw)
    rows.append(("FULL fused step (radiation_step)", t - rtt))

    total = rows[-1][1]
    print(f"\n## Per-stage device timing — ncol={ncol}, nlev=137, f32, "
          f"{jax.devices()[0].device_kind}\n")
    print(f"(RTT {rtt * 1e3:.1f} ms subtracted; stages jitted separately "
          f"so their sum ≠ fused total)\n")
    print("| stage | time (ms) | % of fused step |")
    print("|---|---|---|")
    for name, t in rows:
        print(f"| {name} | {t * 1e3:.1f} | {100.0 * t / total:.0f}% |")
    print(f"\ncols/s (fused, this size): {ncol / total:,.0f}")


if __name__ == "__main__":
    main()
