"""Mixed SW/LW gas models (test/ifs/Makefile:114-121 test_mixed_gas).

The SW and LW paths are independent given fixed solver/cloud settings, so
a mixed run's SW fluxes must equal the pure run that shares its SW gas
model, and likewise for LW.  This also exercises general cloud optics on
the RRTMG band-only spectral definition
(radiation_ifs_rrtm.F90:111-115 allocate_bands_only).
"""

import numpy as np
import pytest

from tests import golden

MIXED_NAM = golden.TEST_IFS + "/configCY49R1_mixed.nam"


def make_config(**over):
    from ecrad_tpu.config import Config
    from ecrad_tpu.namelist import read_namelist_file
    nml = dict(read_namelist_file(MIXED_NAM)["radiation"])
    nml.update(over)
    return Config.from_dict(nml)


@pytest.fixture(scope="module")
def flux_ecckd_both():
    flux, _ = golden.run_config(make_config())
    return flux


@pytest.fixture(scope="module")
def flux_lw_rrtmg():
    cfg = make_config(lw_gas_model_name="RRTMG-IFS",
                      do_cloud_aerosol_per_lw_g_point=False)
    flux, _ = golden.run_config(cfg)
    return flux


@pytest.fixture(scope="module")
def flux_sw_rrtmg():
    cfg = make_config(sw_gas_model_name="RRTMG-IFS",
                      do_cloud_aerosol_per_sw_g_point=False)
    flux, _ = golden.run_config(cfg)
    return flux


def test_sw_independent_of_lw_model(flux_ecckd_both, flux_lw_rrtmg):
    for attr in ("sw_up", "sw_dn", "sw_dn_direct", "sw_up_clear"):
        a = np.asarray(getattr(flux_ecckd_both, attr))
        b = np.asarray(getattr(flux_lw_rrtmg, attr))
        np.testing.assert_allclose(a, b, atol=1e-9, err_msg=attr)


def test_lw_independent_of_sw_model(flux_ecckd_both, flux_sw_rrtmg):
    for attr in ("lw_up", "lw_dn", "lw_up_clear", "lw_dn_clear"):
        a = np.asarray(getattr(flux_ecckd_both, attr))
        b = np.asarray(getattr(flux_sw_rrtmg, attr))
        np.testing.assert_allclose(a, b, atol=1e-9, err_msg=attr)


def test_mixed_models_actually_differ(flux_ecckd_both, flux_lw_rrtmg,
                                      flux_sw_rrtmg):
    # RRTMG and ecCKD LW gas optics are genuinely different models
    d_lw = np.abs(np.asarray(flux_ecckd_both.lw_up)
                  - np.asarray(flux_lw_rrtmg.lw_up)).max()
    assert 0.05 < d_lw < 20.0, d_lw
    d_sw = np.abs(np.asarray(flux_ecckd_both.sw_up)
                  - np.asarray(flux_sw_rrtmg.sw_up)).max()
    assert 0.05 < d_sw < 30.0, d_sw


def test_mixed_fluxes_sane(flux_lw_rrtmg, flux_sw_rrtmg):
    for flux in (flux_lw_rrtmg, flux_sw_rrtmg):
        for attr in ("lw_up", "lw_dn", "sw_up", "sw_dn"):
            v = np.asarray(getattr(flux, attr))
            assert np.isfinite(v).all(), attr
        olr = np.asarray(flux.lw_up)[:, 0]
        assert (olr > 80.0).all() and (olr < 400.0).all()
