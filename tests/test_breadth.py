"""Breadth features: resolved-config dump, HDF5 output, direct aerosol
optical properties, equal-weighting surface mapping."""

import os

import numpy as np
import jax.numpy as jnp

from ecrad_tpu.config import Config, Solver, describe_config

from . import golden


def test_config_print():
    """Resolved-config dump (radiation_config.F90:1411-1612
    print_config): every important namelist key appears with its
    resolved value, in the reference log's layout."""
    config = Config.from_namelist(golden.CONFIG_NAM)
    text = describe_config(config)
    for frag in (
        'Shortwave gas model is "RRTMG-IFS"',
        "(i_gas_model_sw=1)",
        "Aerosols are ON",
        "(use_aerosols=T)",
        'Cloud overlap scheme is "Exp-Ran"',
        'Shortwave solver is "McICA"',
        "(i_solver_sw=2)",
        "(do_weighted_surface_mapping=F)",
        "Longwave derivative calculation is ON",
    ):
        assert frag in text, f"missing: {frag}\n{text}"
    # sections in the reference order
    assert text.index("General settings:") \
        < text.index("Surface and top-of-atmosphere settings:") \
        < text.index("Cloud settings:") < text.index("Solver settings:")


def test_hdf5_output(tmp_path):
    """do_write_hdf5 (driver/ecrad_driver_config.F90:121,
    easy_netcdf.F90 HDF5 option): the flux writer can emit HDF5 with
    the same variables and values as the NetCDF3 path."""
    import h5py

    from ecrad_tpu.io.output import save_fluxes
    from ecrad_tpu.io.netcdf import NcFile

    config = Config.from_namelist(golden.CONFIG_NAM).replace(
        use_aerosols=False,
        sw_solver=Solver.CLOUDLESS, lw_solver=Solver.CLOUDLESS)
    flux, inp = golden.run_config(config)
    phl = inp.thermodynamics.pressure_hl

    nc_path = str(tmp_path / "out.nc")
    h5_path = str(tmp_path / "out.h5")
    save_fluxes(nc_path, config, flux, phl, experiment_name="x")
    save_fluxes(h5_path, config, flux, phl, experiment_name="x",
                hdf5=True)

    with h5py.File(h5_path) as h5, NcFile(nc_path) as nc:
        for var in ("flux_up_sw", "flux_dn_lw", "pressure_hl"):
            a = np.asarray(h5[var])
            b = nc.get(var)
            assert a.shape == b.shape
            np.testing.assert_array_equal(a, b)
        assert h5["flux_up_sw"].attrs["units"] == "W m-2"
        assert h5.attrs["experiment"] == "x"


def test_aerosol_direct_properties():
    """Direct aerosol od/ssa/g input (radiation_aerosol.F90:44-56
    allocate_direct + radiation_aerosol_optics.F90:832
    add_aerosol_optics_direct): passing the band-wise optical
    properties that the mixing-ratio path computes internally must
    give the same fluxes."""
    import functools
    import jax

    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input import DriverConfig, read_input
    from ecrad_tpu.optics import aerosol as aerosol_mod
    from ecrad_tpu import constants

    config = Config.from_namelist(golden.CONFIG_NAM).replace(
        sw_solver=Solver.CLOUDLESS, lw_solver=Solver.CLOUDLESS)
    config, tables = setup_radiation(
        config, data_dir=os.path.join(golden.REFERENCE_DIR, "data"))
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)

    kwargs = dict(
        pressure_hl=jnp.asarray(inp.thermodynamics.pressure_hl),
        temperature_hl=jnp.asarray(inp.thermodynamics.temperature_hl),
        gas_mmr=jnp.asarray(inp.gas_mmr),
        cos_sza=jnp.asarray(inp.cos_sza),
        skin_temperature=jnp.asarray(inp.skin_temperature),
        sw_albedo=jnp.asarray(inp.sw_albedo),
        sw_albedo_direct=jnp.asarray(inp.sw_albedo_direct),
        lw_emissivity=jnp.asarray(inp.lw_emissivity),
        solar_irradiance=float(inp.solar_irradiance))
    fn = jax.jit(functools.partial(radiation, config, tables))

    # mixing-ratio path
    flux_mmr = fn(aerosol={"mixing_ratio": jnp.asarray(inp.aerosol_mmr)},
                  **kwargs)

    # compute the band properties it used internally, convert to
    # (od, ssa, g) per band, feed them through the direct path
    phl = kwargs["pressure_hl"]
    p_fl = 0.5 * (phl[:, :-1] + phl[:, 1:])
    t_fl = 0.5 * (kwargs["temperature_hl"][:, :-1]
                  + kwargs["temperature_hl"][:, 1:])
    h2o = kwargs["gas_mmr"][:, :, constants.GAS_INDEX["h2o"]]
    rh = h2o / aerosol_mod.h2o_sat_liq(p_fl, t_fl)
    aer = aerosol_mod.aerosol_band_properties(
        config, tables.aerosol, phl, jnp.asarray(inp.aerosol_mmr), rh)
    direct = {
        "od_sw": aer["od_sw"],
        "ssa_sw": np.where(np.asarray(aer["od_sw"]) > 0,
                           np.asarray(aer["scat_sw"])
                           / np.maximum(np.asarray(aer["od_sw"]), 1e-300),
                           0.0),
        "g_sw": np.where(np.asarray(aer["scat_sw"]) > 0,
                         np.asarray(aer["scatg_sw"])
                         / np.maximum(np.asarray(aer["scat_sw"]), 1e-300),
                         0.0),
        "od_lw": aer["od_lw"],
        "ssa_lw": np.where(np.asarray(aer["od_lw"]) > 0,
                           np.asarray(aer["scat_lw"])
                           / np.maximum(np.asarray(aer["od_lw"]), 1e-300),
                           0.0),
        "g_lw": np.where(np.asarray(aer["scat_lw"]) > 0,
                         np.asarray(aer["scatg_lw"])
                         / np.maximum(np.asarray(aer["scat_lw"]), 1e-300),
                         0.0),
    }
    flux_direct = fn(aerosol={k: jnp.asarray(v)
                              for k, v in direct.items()}, **kwargs)

    for a in ("sw_dn", "sw_up", "lw_dn", "lw_up"):
        err = np.abs(np.asarray(getattr(flux_mmr, a))
                     - np.asarray(getattr(flux_direct, a))).max()
        assert err < 1e-6, f"{a}: {err}"

    # and aerosols must actually matter (the test is not vacuous)
    flux_none = fn(aerosol=None, **kwargs)
    assert np.abs(np.asarray(flux_none.sw_dn)
                  - np.asarray(flux_mmr.sw_dn)).max() > 0.5


def test_equal_weighting_mapping():
    """equal_weighting in calc_mapping_from_bands (the capability behind
    do_weighted_surface_mapping=false, radiation_config.F90:507-512;
    the reference's v1.7.1 consolidate never actually uses it — both
    branches are identical — so the production path always weights,
    matching the committed goldens)."""
    from ecrad_tpu.optics.spectral import (
        calc_mapping_from_bands, SOLAR_REFERENCE_TEMPERATURE)

    wn1 = np.array([2600.0, 4000.0])
    wn2 = np.array([4000.0, 6000.0])
    # one interval boundary inside band 2 at 5000 cm-1 (2e-6 m)
    m_planck = calc_mapping_from_bands(
        wn1, wn2, SOLAR_REFERENCE_TEMPERATURE, [2.0e-6], [1, 2])
    m_equal = calc_mapping_from_bands(
        wn1, wn2, SOLAR_REFERENCE_TEMPERATURE, [2.0e-6], [1, 2],
        equal_weighting=True)
    # columns normalized
    np.testing.assert_allclose(m_planck.sum(axis=0), 1.0)
    np.testing.assert_allclose(m_equal.sum(axis=0), 1.0)
    # equal weighting splits band 2 at exactly the wavenumber fraction
    np.testing.assert_allclose(m_equal[1, 1], 0.5, atol=1e-12)
    # Planck weighting at 5777K tilts toward higher wavenumber -> the
    # two differ
    assert abs(m_planck[1, 1] - 0.5) > 0.01
