"""Golden-file comparison harness shared by integration tests.

Mirrors the reference test strategy (test/common/nccmp.py + the namelist
matrix in test/ifs/Makefile): run a configuration on
test/ifs/ecrad_meridian.nc and compare against the committed
*_REFERENCE.nc within the reference's own double-precision thresholds
(LW 0.001 / SW 0.1 W m-2, test/ifs/CMakeLists.txt:15-21).
"""

from __future__ import annotations

import functools
import os

import numpy as np

REFERENCE_DIR = "/root/reference"
TEST_IFS = os.path.join(REFERENCE_DIR, "test", "ifs")
INPUT_FILE = os.path.join(TEST_IFS, "ecrad_meridian.nc")
CONFIG_NAM = os.path.join(TEST_IFS, "configCY49R1.nam")

LW_VARS = ("flux_up_lw", "flux_dn_lw", "flux_up_lw_clear",
           "flux_dn_lw_clear", "canopy_flux_dn_lw_surf", "lw_derivative")
SW_VARS = ("flux_up_sw", "flux_dn_sw", "flux_dn_direct_sw",
           "flux_up_sw_clear", "flux_dn_sw_clear",
           "flux_dn_direct_sw_clear", "canopy_flux_dn_diffuse_sw_surf",
           "canopy_flux_dn_direct_sw_surf",
           "spectral_flux_dn_sw_surf", "spectral_flux_dn_direct_sw_surf",
           "spectral_flux_dn_sw_surf_clear",
           "spectral_flux_dn_direct_sw_surf_clear")


def make_cloud_inputs(config, inp):
    """Build the cloud input dict, including bit-exact McICA samples
    (host-side generator, solvers/cloud_generator_exact.py)."""
    import jax.numpy as jnp

    from ecrad_tpu.config import Solver
    from ecrad_tpu.solvers import cloud_generator_exact as cge

    # crop_cloud_fraction, as radiation() will apply it, so the
    # generator sees the same fraction field
    frac = np.asarray(inp.cloud_fraction)
    total_water = inp.cloud_mixing_ratio.sum(axis=-1)
    frac = np.where((frac >= config.cloud_fraction_threshold)
                    & (total_water >= config.cloud_mixing_ratio_threshold),
                    frac, 0.0)
    cloud = {
        "fraction": jnp.asarray(inp.cloud_fraction),
        "q_liq": jnp.asarray(inp.cloud_mixing_ratio[:, :, 0]),
        "q_ice": jnp.asarray(inp.cloud_mixing_ratio[:, :, 1]),
        "re_liq": jnp.asarray(inp.cloud_effective_radius[:, :, 0]),
        "re_ice": jnp.asarray(inp.cloud_effective_radius[:, :, 1]),
        "overlap_param": jnp.asarray(inp.overlap_param),
        "fractional_std": jnp.asarray(inp.fractional_std),
    }
    if inp.inv_cloud_effective_size is not None:
        cloud["inv_cloud_effective_size"] = jnp.asarray(
            inp.inv_cloud_effective_size)
        if inp.inv_inhom_effective_size is not None:
            cloud["inv_inhom_effective_size"] = jnp.asarray(
                inp.inv_inhom_effective_size)
    if Solver.MCICA in (config.sw_solver, config.lw_solver):
        from ecrad_tpu.io.netcdf import NcFile
        from ecrad_tpu.config import PdfShape
        pdf_file = ("mcica_gamma.nc"
                    if config.cloud_pdf_shape == PdfShape.GAMMA
                    else "mcica_lognormal.nc")
        with NcFile(os.path.join(REFERENCE_DIR, "data", pdf_file)) as f:
            sampler = cge.PdfSampler(f.get("fsd"), f.get("x").T)
        common = dict(
            i_overlap_scheme=int(config.overlap_scheme),
            frac_threshold=config.cloud_fraction_threshold,
            frac=frac, overlap_param=inp.overlap_param,
            decorrelation_scaling=config.cloud_inhom_decorr_scaling,
            fractional_std=inp.fractional_std, pdf_sampler=sampler,
            use_beta_overlap=config.use_beta_overlap)
        if config.sw_solver == Solver.MCICA:
            od_s, tcc = cge.cloud_generator_all_columns(
                ng=config.n_g_sw, iseed=inp.iseed, **common)
            cloud["od_scaling_sw"] = jnp.asarray(od_s)
            cloud["total_cloud_cover_sw"] = jnp.asarray(tcc)
        if config.lw_solver == Solver.MCICA:
            od_s, tcc = cge.cloud_generator_all_columns(
                ng=config.n_g_lw, iseed=inp.iseed + 997, **common)
            cloud["od_scaling_lw"] = jnp.asarray(od_s)
            cloud["total_cloud_cover_lw"] = jnp.asarray(tcc)
    return cloud


def run_config(config, driver_config=None, input_path=INPUT_FILE,
               extra_inputs=None):
    """Run the radiation scheme for a Config; returns (flux, inp)."""
    import jax
    import jax.numpy as jnp

    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input import DriverConfig, read_input

    dc = driver_config or DriverConfig.from_namelist(CONFIG_NAM)
    config, tables = setup_radiation(
        config, data_dir=os.path.join(REFERENCE_DIR, "data"))
    inp = read_input(input_path, dc)

    cloud = None
    if config.do_clouds:
        cloud = make_cloud_inputs(config, inp)

    kwargs = dict(
        cloud=cloud,
        pressure_hl=jnp.asarray(inp.thermodynamics.pressure_hl),
        temperature_hl=jnp.asarray(inp.thermodynamics.temperature_hl),
        gas_mmr=jnp.asarray(inp.gas_mmr),
        cos_sza=jnp.asarray(inp.cos_sza),
        skin_temperature=jnp.asarray(inp.skin_temperature),
        sw_albedo=jnp.asarray(inp.sw_albedo),
        sw_albedo_direct=jnp.asarray(inp.sw_albedo_direct),
        lw_emissivity=jnp.asarray(inp.lw_emissivity),
        solar_irradiance=float(inp.solar_irradiance),
    )
    if extra_inputs:
        kwargs.update(extra_inputs)
    fn = jax.jit(functools.partial(radiation, config, tables))
    flux = fn(**kwargs)
    jax.block_until_ready(flux)
    return flux, inp


FLUX_ATTR = {
    "flux_up_lw": "lw_up", "flux_dn_lw": "lw_dn",
    "flux_up_lw_clear": "lw_up_clear", "flux_dn_lw_clear": "lw_dn_clear",
    "lw_derivative": "lw_derivatives",
    "canopy_flux_dn_lw_surf": "lw_dn_surf_canopy",
    "flux_up_sw": "sw_up", "flux_dn_sw": "sw_dn",
    "flux_dn_direct_sw": "sw_dn_direct",
    "flux_up_sw_clear": "sw_up_clear", "flux_dn_sw_clear": "sw_dn_clear",
    "flux_dn_direct_sw_clear": "sw_dn_direct_clear",
    "canopy_flux_dn_diffuse_sw_surf": "sw_dn_diffuse_surf_canopy",
    "canopy_flux_dn_direct_sw_surf": "sw_dn_direct_surf_canopy",
    "spectral_flux_dn_sw_surf": "sw_dn_surf_band",
    "spectral_flux_dn_direct_sw_surf": "sw_dn_direct_surf_band",
    "spectral_flux_dn_sw_surf_clear": "sw_dn_surf_clear_band",
    "spectral_flux_dn_direct_sw_surf_clear":
        "sw_dn_direct_surf_clear_band",
    "cloud_cover_lw": "cloud_cover_lw", "cloud_cover_sw": "cloud_cover_sw",
}


def compare(flux, reference_nc, lw_threshold=0.001, sw_threshold=0.1,
            skip=()):
    """nccmp-equivalent: per-variable max-abs-error check. Returns a dict
    of errors; raises AssertionError listing violations."""
    from ecrad_tpu.io.netcdf import NcFile

    errors = {}
    failures = []
    with NcFile(reference_nc) as ref:
        for var, attr in FLUX_ATTR.items():
            if var in skip or not ref.exists(var):
                continue
            mine = getattr(flux, attr, None)
            if mine is None:
                failures.append(f"{var}: missing from our output")
                continue
            r = ref.get(var)
            m = np.asarray(mine)
            err = float(np.abs(m - r).max())
            errors[var] = err
            thresh = lw_threshold if "lw" in var else sw_threshold
            # reference files are stored float32: allow storage rounding
            thresh = max(thresh, 2.0e-5 * np.abs(r).max())
            if err > thresh:
                failures.append(f"{var}: max abs err {err:.6f} > {thresh}")
    if failures:
        raise AssertionError("Golden comparison failed:\n  "
                             + "\n  ".join(failures))
    return errors
