"""Bounds checking (radiation_check.F90) and debug dumps
(radiation_save.F90 save_inputs/save_radiative_properties)."""

import os

import numpy as np
import pytest

from tests import golden


def test_out_of_bounds_fix():
    from ecrad_tpu.check import out_of_bounds
    bad, fixed = out_of_bounds(np.array([0.5, 1.5, np.nan]), "x",
                               0.0, 1.0, do_fix=True)
    assert bad
    np.testing.assert_allclose(fixed, [0.5, 1.0, 0.0])
    ok, same = out_of_bounds(np.array([0.1, 0.9]), "x", 0.0, 1.0)
    assert not ok


def test_check_inputs_roundtrip():
    from ecrad_tpu.check import check_inputs
    from ecrad_tpu.io.input import DriverConfig, read_input
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    any_bad, fixed = check_inputs(inp)
    assert not any_bad                 # meridian input is physical
    # corrupt a field and verify detection + repair
    inp.cloud_fraction[0, 0] = 1.5
    any_bad, fixed = check_inputs(inp, do_fix=True,
                                  out=open(os.devnull, "w"))
    assert any_bad
    assert fixed.cloud_fraction[0, 0] == 1.0


def test_save_inputs_roundtrip(tmp_path):
    from ecrad_tpu.config import Config
    from ecrad_tpu.io.input import DriverConfig, read_input
    from ecrad_tpu.io.save_extras import save_inputs
    cfg = Config.from_namelist(golden.CONFIG_NAM)
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    out = os.path.join(tmp_path, "inputs.nc")
    save_inputs(out, cfg, inp)
    # the dump must be readable by the same input reader
    inp2 = read_input(out, DriverConfig())
    np.testing.assert_allclose(inp2.thermodynamics.pressure_hl,
                               inp.thermodynamics.pressure_hl)
    np.testing.assert_allclose(inp2.gas_mmr, inp.gas_mmr, rtol=1e-6)
    np.testing.assert_allclose(inp2.cloud_fraction, inp.cloud_fraction,
                               atol=1e-7)
    np.testing.assert_allclose(inp2.cos_sza, inp.cos_sza, atol=1e-7)


def test_radiative_properties(tmp_path):
    import jax.numpy as jnp
    from ecrad_tpu.config import Config
    from ecrad_tpu.interface import (compute_radiative_properties,
                                     setup_radiation)
    from ecrad_tpu.io.input import DriverConfig, read_input
    from ecrad_tpu.io.save_extras import save_radiative_properties
    from ecrad_tpu.io.netcdf import NcFile

    cfg = Config.from_namelist(golden.CONFIG_NAM)
    cfg, tables = setup_radiation(cfg, data_dir="/root/reference/data")
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    cloud = golden.make_cloud_inputs(cfg, inp)
    props = compute_radiative_properties(
        cfg, tables,
        pressure_hl=jnp.asarray(inp.thermodynamics.pressure_hl),
        temperature_hl=jnp.asarray(inp.thermodynamics.temperature_hl),
        gas_mmr=jnp.asarray(inp.gas_mmr),
        cos_sza=jnp.asarray(inp.cos_sza),
        skin_temperature=jnp.asarray(inp.skin_temperature),
        sw_albedo=jnp.asarray(inp.sw_albedo),
        sw_albedo_direct=jnp.asarray(inp.sw_albedo_direct),
        lw_emissivity=jnp.asarray(inp.lw_emissivity),
        solar_irradiance=float(inp.solar_irradiance),
        cloud=cloud, aerosol={"mixing_ratio":
                              jnp.asarray(inp.aerosol_mmr)})
    ncol, nhl = inp.thermodynamics.pressure_hl.shape
    assert np.asarray(props["od_lw"]).shape == (ncol, nhl - 1, 140)
    assert np.asarray(props["od_sw"]).shape == (ncol, nhl - 1, 112)
    assert (np.asarray(props["od_lw"]) > 0.0).all()
    ssa = np.asarray(props["ssa_sw"])
    assert (ssa >= 0.0).all() and (ssa <= 1.0 + 1e-12).all()
    assert np.asarray(props["od_sw_cloud"]).shape == (ncol, nhl - 1, 14)
    out = os.path.join(tmp_path, "radiative_properties.nc")
    save_radiative_properties(out, cfg, props)
    with NcFile(out) as f:
        for v in ("od_lw", "od_sw", "planck_hl", "incoming_sw",
                  "od_sw_cloud", "cloud_fraction"):
            assert f.exists(v), v


def test_radiation_reverse(tmp_path):
    """Surface-first input files are auto-flipped
    (radiation_interface.F90:519 radiation_reverse): a level-reversed
    copy of the meridian file must give identical fluxes."""
    import dataclasses
    from ecrad_tpu.config import Config
    from ecrad_tpu.containers import Thermodynamics
    from ecrad_tpu.io.input import DriverConfig, read_input
    from ecrad_tpu.io.save_extras import save_inputs

    cfg = Config.from_namelist(golden.CONFIG_NAM)
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    assert not inp.flipped

    flipped = dataclasses.replace(inp)
    flipped.thermodynamics = Thermodynamics(
        pressure_hl=inp.thermodynamics.pressure_hl[:, ::-1].copy(),
        temperature_hl=inp.thermodynamics.temperature_hl[:, ::-1].copy())
    for f in ("gas_mmr", "cloud_mixing_ratio", "cloud_effective_radius",
              "cloud_fraction", "fractional_std", "overlap_param",
              "inv_cloud_effective_size", "inv_inhom_effective_size",
              "aerosol_mmr"):
        v = getattr(inp, f)
        if v is not None:
            setattr(flipped, f, v[:, ::-1].copy())
    path = os.path.join(tmp_path, "meridian_flipped.nc")
    save_inputs(path, cfg, flipped)

    inp2 = read_input(path, DriverConfig())
    assert inp2.flipped
    np.testing.assert_allclose(inp2.thermodynamics.pressure_hl,
                               inp.thermodynamics.pressure_hl)
    np.testing.assert_allclose(inp2.cloud_fraction, inp.cloud_fraction,
                               atol=1e-7)
    np.testing.assert_allclose(inp2.gas_mmr, inp.gas_mmr, rtol=1e-6)
    np.testing.assert_allclose(inp2.overlap_param, inp.overlap_param,
                               atol=1e-7)
