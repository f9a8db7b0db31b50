"""Library-level Gas container API (reference radiation_gas.F90:36-79:
put/put_well_mixed/scale/set_units/assert_units/get/reverse/
out_of_physical_bounds) and VMR input support in the IFS layer."""

import jax.numpy as jnp
import numpy as np
import pytest

from ecrad_tpu import constants
from ecrad_tpu.gas import Gas


def test_put_get_roundtrip_units():
    g = Gas.allocate(3, 4)
    vmr = np.full((3, 4), 400e-6)          # CO2, dimensionless VMR
    g = g.put("co2", "vmr", jnp.asarray(vmr))
    # vmr -> mmr -> vmr roundtrip (radiation_gas.F90:440-446 factors)
    mmr = np.asarray(g.get("co2", "mmr"))
    expect = vmr * constants.MOLAR_MASS["co2"] \
        / constants.MOLAR_MASS_DRY_AIR
    np.testing.assert_allclose(mmr, expect, rtol=1e-6)
    back = np.asarray(g.set_units("mmr").get("co2", "vmr"))
    np.testing.assert_allclose(back, vmr, rtol=1e-6)


def test_scale_factor_semantics():
    """Stored numbers x scale_factor = dimensionless: PPMV storage."""
    g = Gas.allocate(2, 3)
    g = g.put("ch4", "vmr", jnp.full((2, 3), 1800.0), scale_factor=1e-9)
    # ppbv storage: dimensionless VMR is 1800e-9
    np.testing.assert_allclose(np.asarray(g.get("ch4", "vmr")),
                               1800e-9, rtol=1e-6)
    # set_units to plain dimensionless VMR rescales the numbers
    g2 = g.set_units("vmr")
    np.testing.assert_allclose(
        np.asarray(g2.mixing_ratio[:, :, constants.GAS_INDEX["ch4"]]),
        1800e-9, rtol=1e-6)
    g2.assert_units("vmr")


def test_scale_then_set_units():
    """scale() folds into the factor, applied at set_units
    (radiation_gas.F90:377-396: 2xCO2 experiment pattern)."""
    g = Gas.allocate(2, 2)
    g = g.put("co2", "vmr", jnp.full((2, 2), 400e-6)).scale("co2", 2.0)
    np.testing.assert_allclose(np.asarray(g.get("co2", "vmr")),
                               800e-6, rtol=1e-6)


def test_put_well_mixed_and_presence():
    g = Gas.allocate(2, 5)
    assert not g.is_present("o2")
    g = g.put_well_mixed("o2", "vmr", 0.20944)
    assert g.is_present("o2") and "o2" in g.well_mixed
    mmr = np.asarray(g.get("o2", "mmr"))
    np.testing.assert_allclose(
        mmr, 0.20944 * constants.MOLAR_MASS["o2"]
        / constants.MOLAR_MASS_DRY_AIR, rtol=1e-6)
    # overwriting with a 2-D field clears the well-mixed flag
    g2 = g.put("o2", "mmr", jnp.zeros((2, 5)))
    assert "o2" not in g2.well_mixed


def test_assert_units_raises():
    g = Gas.allocate(1, 2).put("h2o", "mmr", jnp.zeros((1, 2)))
    g.assert_units("mmr")
    with pytest.raises(AssertionError):
        g.assert_units("vmr")


def test_absent_gas_returns_zero():
    g = Gas.allocate(2, 3)
    np.testing.assert_array_equal(np.asarray(g.get("n2o", "mmr")), 0.0)


def test_reverse_and_bounds():
    g = Gas.allocate(1, 3)
    prof = jnp.asarray([[1.0e-3, 2.0e-3, 3.0e-3]])
    g = g.put("h2o", "mmr", prof)
    rev = g.reverse()
    np.testing.assert_allclose(
        np.asarray(rev.get("h2o", "mmr")), np.asarray(prof)[:, ::-1])
    bad, _ = g.out_of_physical_bounds()
    assert not bool(bad)
    g_bad = g.put("h2o", "mmr", jnp.asarray([[2.0, -0.1, 0.5]]))
    bad, fixed = g_bad.out_of_physical_bounds(correct=True)
    assert bool(bad)
    fx = np.asarray(fixed.get("h2o", "mmr"))
    assert fx.min() >= 0.0 and fx.max() <= 1.0


def test_gas_is_jit_safe():
    import jax

    @jax.jit
    def total_mmr(gas):
        return jnp.sum(gas.to_mmr())

    g = Gas.allocate(2, 3).put("co2", "vmr", jnp.full((2, 3), 400e-6))
    v = float(total_mmr(g))
    expect = 6 * 400e-6 * constants.MOLAR_MASS["co2"] \
        / constants.MOLAR_MASS_DRY_AIR
    assert np.isclose(v, expect, rtol=1e-6)


def test_ifs_scheme_accepts_vmr():
    """The IFS wrapper gives identical fluxes for MMR inputs and the
    equivalent VMR inputs (gas_units='vmr') — the host-model path the
    reference serves via GAS%PUT(IVolumeMixingRatio)
    (ifs/radiation_scheme.F90:527-536)."""
    from ecrad_tpu.config import Config
    from ecrad_tpu.namelist import read_namelist_file
    from ecrad_tpu.ifs.scheme import (radiation_scheme,
                                      setup_radiation_scheme)
    from ecrad_tpu.io.input import DriverConfig, read_input
    from tests import golden

    nml = dict(read_namelist_file(golden.CONFIG_NAM)["radiation"])
    cfg = Config.from_dict(nml)
    scheme = setup_radiation_scheme(cfg, data_dir="/root/reference/data")
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)

    nsel = 8                             # a small column subset
    phl = inp.thermodynamics.pressure_hl[:nsel]
    thl = inp.thermodynamics.temperature_hl[:nsel]
    ncol, nlev1 = phl.shape
    nlev = nlev1 - 1
    p_fl = 0.5 * (phl[:, :-1] + phl[:, 1:])
    t_fl = 0.5 * (thl[:, :-1] + thl[:, 1:])

    def g(name):
        return inp.gas_mmr[:nsel, :, constants.GAS_INDEX[name]]

    kw = dict(
        solar_irradiance=float(inp.solar_irradiance),
        mu0=inp.cos_sza[:nsel],
        skin_temperature=inp.skin_temperature[:nsel],
        albedo_diffuse=inp.sw_albedo[:nsel],
        albedo_direct=inp.sw_albedo_direct[:nsel],
        spectral_emissivity=inp.lw_emissivity[:nsel],
        sin_lat=np.zeros(ncol), lon=np.zeros(ncol),
        land_frac=np.zeros(ncol),
        pressure_fl=p_fl, temperature_fl=t_fl,
        pressure_hl=phl, temperature_hl=thl,
        q=g("h2o"), co2=g("co2"), ch4=g("ch4"), n2o=g("n2o"),
        no2=g("no2"), cfc11=g("cfc11"), cfc12=g("cfc12"),
        hcfc22=g("hcfc22"), ccl4=g("ccl4"), o3=g("o3"),
        cloud_frac=inp.cloud_fraction[:nsel],
        q_liquid=inp.cloud_mixing_ratio[:nsel, :, 0],
        q_ice=inp.cloud_mixing_ratio[:nsel, :, 1],
        q_rain=np.zeros((ncol, nlev)), q_snow=np.zeros((ncol, nlev)),
        aerosol_mmr=inp.aerosol_mmr[:nsel],
        iseed=inp.iseed[:nsel])
    out_mmr = radiation_scheme(scheme, **kw)

    kw_vmr = dict(kw)
    for name in ("co2", "ch4", "n2o", "no2", "cfc11", "cfc12",
                 "hcfc22", "ccl4", "o3"):
        kw_vmr[name] = np.asarray(kw[name]) \
            * constants.MOLAR_MASS_DRY_AIR / constants.MOLAR_MASS[name]
    kw_vmr["q"] = np.asarray(kw["q"]) * constants.MOLAR_MASS_DRY_AIR \
        / constants.MOLAR_MASS["h2o"]
    out_vmr = radiation_scheme(scheme, **kw_vmr, gas_units="vmr")

    for key in ("flux_sw", "flux_lw", "flux_sw_clear", "flux_lw_clear"):
        np.testing.assert_allclose(np.asarray(out_mmr[key]),
                                   np.asarray(out_vmr[key]),
                                   rtol=2e-5, atol=2e-3)
