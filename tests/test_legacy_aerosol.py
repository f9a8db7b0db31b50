"""Legacy band-wise aerosol optics (aerosol_ifs_rrtm_46R1_with_NI_AM.nc).

The IFS cycle configs before CY49R1 (configCY43R3/46R1/47R1/47R3.nam) set
use_general_aerosol_optics=false, which in the reference loads a file
whose optical properties are already on the RRTMG band grid
(radiation_aerosol_optics.F90:59-62).  No golden output is committed
upstream for these cycles, so this validates structurally: the legacy
tables load with the right shapes, the full CY47R1 configuration runs
end-to-end, fluxes are finite/physical, and the aerosol perturbation it
produces is of a realistic size and sign relative to a no-aerosol run.
"""

import os

import numpy as np

from ecrad_tpu.config import Config

from . import golden

CONFIG_47R1 = os.path.join(golden.TEST_IFS, "configCY47R1.nam")


def test_legacy_aerosol_tables_shapes():
    from ecrad_tpu.io.netcdf import NcFile
    from ecrad_tpu.optics import aerosol as aerosol_mod

    path = os.path.join(golden.REFERENCE_DIR, "data",
                        "aerosol_ifs_rrtm_46R1_with_NI_AM.nc")
    with NcFile(path) as f:
        tables = aerosol_mod._load_legacy_aerosol_optics(f, path, 14, 16)
    assert tables["mass_ext_sw_phobic"].shape == (14, 14)
    assert tables["mass_ext_lw_phobic"].shape == (16, 14)
    assert tables["use_hydrophilic"]
    assert tables["mass_ext_sw_philic"].shape == (14, 10, 12)
    assert tables["mass_ext_lw_philic"].shape == (16, 10, 12)
    assert tables["rh_lower"].shape == (12,)
    for k in ("ssa_sw_phobic", "ssa_lw_phobic", "ssa_sw_philic",
              "ssa_lw_philic"):
        assert np.all(tables[k] >= 0.0) and np.all(tables[k] <= 1.0)
    for k in ("g_sw_phobic", "g_lw_phobic", "g_sw_philic", "g_lw_philic"):
        assert np.all(np.abs(tables[k]) <= 1.0)
    assert np.all(tables["mass_ext_sw_phobic"] > 0.0)


def test_legacy_band_mapping_to_gpoints():
    """calc_mapping_from_wavenumber_bands: energy conservation — every
    target g-point's weight is fully distributed over source bands
    (radiation_spectral_definition.F90:818-877)."""
    from ecrad_tpu.io.netcdf import NcFile
    from ecrad_tpu.optics.spectral_def import SpectralDefinition

    ckd = os.path.join(
        golden.REFERENCE_DIR, "data",
        "ecckd-1.2_sw_climate_window-32b_ckd-definition.nc")
    if not os.path.exists(ckd):
        import glob
        cands = glob.glob(os.path.join(golden.REFERENCE_DIR, "data",
                                       "ecckd-*_sw_*ckd-definition.nc"))
        ckd = cands[0]
    with NcFile(ckd) as f:
        sd = SpectralDefinition.from_file(f)
    path = os.path.join(golden.REFERENCE_DIR, "data",
                        "aerosol_ifs_rrtm_46R1_with_NI_AM.nc")
    with NcFile(path) as f:
        wn1 = f.get("wavenumber1_sw")
        wn2 = f.get("wavenumber2_sw")
    mapping = sd.calc_mapping_from_wavenumber_bands(wn1, wn2,
                                                    use_bands=False)
    assert mapping.shape == (len(wn1), sd.ng)
    np.testing.assert_allclose(mapping.sum(axis=0), 1.0, atol=1e-10)
    assert np.all(mapping >= -1e-12)


def test_cy47r1_legacy_aerosols_run():
    import jax.numpy as jnp

    from ecrad_tpu.io.input import DriverConfig, read_input

    config = Config.from_namelist(CONFIG_47R1)
    assert not config.use_general_aerosol_optics
    dc = DriverConfig.from_namelist(CONFIG_47R1)
    inp0 = read_input(golden.INPUT_FILE, dc)
    extra = {"aerosol": {"mixing_ratio": jnp.asarray(inp0.aerosol_mmr)}}
    flux, inp = golden.run_config(config, extra_inputs=extra)

    config_noaer = config.replace(use_aerosols=False)
    flux0, _ = golden.run_config(config_noaer)

    for f in (flux, flux0):
        for name in ("lw_up", "lw_dn", "sw_up", "sw_dn", "sw_dn_direct",
                     "lw_up_clear", "lw_dn_clear", "sw_up_clear",
                     "sw_dn_clear"):
            arr = np.asarray(getattr(f, name))
            assert np.all(np.isfinite(arr)), name
            assert arr.min() >= -1e-6, name
            assert arr.max() < 1500.0, name

    # TOA downward SW equals solar_irradiance * mu0 exactly
    mu0 = np.maximum(np.asarray(inp.cos_sza), 0.0)
    np.testing.assert_allclose(np.asarray(flux.sw_dn)[:, 0],
                               float(inp.solar_irradiance) * mu0,
                               atol=2e-3)

    # Aerosols must reduce clear-sky surface direct SW where the sun is
    # up (scattering+absorption along the direct beam), and the net
    # perturbation should be small (AOD << 1 for this profile set).
    day = mu0 > 0.05
    direct_with = np.asarray(flux.sw_dn_direct_clear)[day, -1]
    direct_without = np.asarray(flux0.sw_dn_direct_clear)[day, -1]
    assert np.all(direct_with <= direct_without + 1e-6)
    assert direct_with.sum() < direct_without.sum()  # strictly some effect
    rel = (direct_without - direct_with) / np.maximum(direct_without, 1.0)
    assert rel.max() < 0.7, "implausibly large aerosol extinction"

    # Clear-sky LW surface down should shift by < 10 W m-2
    dlw = np.abs(np.asarray(flux.lw_dn_clear)[:, -1]
                 - np.asarray(flux0.lw_dn_clear)[:, -1])
    assert dlw.max() < 10.0
