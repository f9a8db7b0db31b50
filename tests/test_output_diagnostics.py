"""Spectral/TOA/g-point flux diagnostics
(radiation_flux.F90:397-660 calc_surface_spectral/calc_toa_spectral;
radiation_save.F90 save_fluxes spectral outputs;
do_save_gpoint_flux semantics of radiation_config.F90 consolidate)."""

import os

import numpy as np
import pytest

from tests import golden


def run(tmp_path=None, **over):
    from ecrad_tpu.config import Config
    from ecrad_tpu.namelist import read_namelist_file
    nml = dict(read_namelist_file(golden.CONFIG_NAM)["radiation"])
    nml.update(over)
    cfg = Config.from_dict(nml)
    flux, inp = golden.run_config(cfg)
    return cfg, flux, inp


def test_toa_spectral(tmp_path):
    cfg, flux, inp = run(do_toa_spectral_flux=True)
    for f in ("lw_up_toa_band", "lw_up_toa_clear_band", "sw_dn_toa_band",
              "sw_up_toa_band", "sw_up_toa_clear_band"):
        v = getattr(flux, f)
        assert v is not None, f
    # band sums reproduce the broadband TOA fluxes
    np.testing.assert_allclose(
        np.asarray(flux.lw_up_toa_band).sum(-1),
        np.asarray(flux.lw_up)[:, 0], rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(flux.sw_up_toa_band).sum(-1),
        np.asarray(flux.sw_up)[:, 0], rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(flux.sw_dn_toa_band).sum(-1),
        np.asarray(flux.sw_dn)[:, 0], rtol=1e-12, atol=1e-9)
    # written to file with the reference variable names
    from ecrad_tpu.io.output import save_fluxes
    from ecrad_tpu.io.netcdf import NcFile
    out = os.path.join(tmp_path, "out.nc")
    import jax.numpy as jnp
    save_fluxes(out, cfg, flux, inp.thermodynamics.pressure_hl)
    with NcFile(out) as f:
        for v in ("spectral_flux_up_lw_toa", "spectral_flux_dn_sw_toa",
                  "spectral_flux_up_sw_toa",
                  "spectral_flux_up_sw_toa_clear"):
            assert f.exists(v), v


def test_gpoint_flux(tmp_path):
    cfg, flux, inp = run(do_save_gpoint_flux=True,
                         do_save_spectral_flux=False)
    ng_lw, ng_sw = 140, 112       # RRTMG g-point counts
    assert np.asarray(flux.lw_up_band).shape[-1] == ng_lw
    assert np.asarray(flux.sw_up_band).shape[-1] == ng_sw
    # per-g fluxes sum to broadband at every half level
    np.testing.assert_allclose(
        np.asarray(flux.lw_up_band).sum(-1), np.asarray(flux.lw_up),
        rtol=1e-12, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(flux.sw_dn_band).sum(-1), np.asarray(flux.sw_dn),
        rtol=1e-12, atol=1e-9)


def test_spectral_profile_direct():
    cfg, flux, inp = run()        # CY49R1 has do_save_spectral_flux=true
    assert np.asarray(flux.sw_dn_direct_band).shape[-1] == 14
    np.testing.assert_allclose(
        np.asarray(flux.sw_dn_direct_band).sum(-1),
        np.asarray(flux.sw_dn_direct), rtol=1e-12, atol=1e-9)


def test_sw_diagnostics_file(tmp_path):
    """save_sw_diagnostics (radiation_save.F90:1314-1473) +
    get_sw_mapping (radiation_config.F90:1766-1828): RGB example from
    configCY49R1_mixed.nam."""
    from ecrad_tpu.io.output import save_sw_diagnostics
    from ecrad_tpu.io.netcdf import NcFile
    from ecrad_tpu.optics.spectral import get_sw_mapping

    cfg, flux, inp = run()
    from ecrad_tpu.optics.spectral_def import SpectralDefinition
    from ecrad_tpu.optics import rrtmg_data
    specdef = SpectralDefinition.bands_only(
        rrtmg_data.SW_WAVENUM1, rrtmg_data.SW_WAVENUM2, is_solar=True)
    bounds = (0.4e-6, 0.5e-6, 0.6e-6, 0.7e-6)
    mapping = get_sw_mapping(specdef, bounds)
    assert mapping.shape == (3, 14)
    assert (mapping >= 0.0).all() and (mapping <= 1.0 + 1e-12).all()
    out = os.path.join(tmp_path, "sw_diag.nc")
    save_sw_diagnostics(out, cfg, bounds, mapping, flux)
    with NcFile(out) as f:
        rgb = f.get("flux_dn_sw_surf")
        assert rgb.shape[1] == 3
        assert (rgb >= 0.0).all()
        # visible sub-intervals are below the total surface SW flux
        total = np.asarray(flux.sw_dn_surf_band).sum(-1)
        assert (rgb.sum(-1) <= total + 1e-3).all()
        np.testing.assert_allclose(f.get("wavelength1"), bounds[:-1])
