"""Spectral solar cycle (ecCKD) and spectral solar scaling (RRTMG).

Reference: radiation_ecckd.F90:295-455 (read_spectral_solar_cycle),
radiation_ecckd.F90:935-966 (calc_incoming_sw with multiplier),
radiation_ifs_rrtm.F90:543-563 (per-band scaling then TSI renorm)."""

import numpy as np
import pytest

from ecrad_tpu.config import Config, GasModel
from ecrad_tpu.data import DATA_DIR
from ecrad_tpu.interface import setup_radiation
from ecrad_tpu.optics import ecckd as ecckd_mod


@pytest.fixture(scope="module")
def ecckd_solar():
    config = Config(gas_model_sw=GasModel.ECCKD,
                    gas_model_lw=GasModel.ECCKD,
                    use_spectral_solar_cycle=True)
    return setup_radiation(config, data_dir=DATA_DIR)


def test_solar_cycle_amplitude_properties(ecckd_solar):
    config, tables = ecckd_solar
    t = tables.gas["sw"]
    norm = np.asarray(t["norm_solar_irradiance"])
    amp = np.asarray(t["norm_amplitude_solar_irradiance"])
    assert amp.shape == norm.shape
    # the amplitude is mean-free: the user scales TSI separately
    # (radiation_ecckd.F90:434-439)
    assert abs(amp.sum()) < 1e-12
    assert np.abs(amp).max() > 0.0
    # solar-cycle variability is spectrally selective: UV varies by
    # percent-level, visible/near-IR by much less
    rel = np.abs(amp) / norm
    assert rel.max() > 1e-3
    assert rel.min() < rel.max() / 5.0


def test_solar_cycle_multiplier_changes_incoming(ecckd_solar):
    config, tables = ecckd_solar
    t, meta = tables.gas["sw"], tables.gas_meta["sw"]
    tsi = 1361.0
    inc0 = np.asarray(ecckd_mod.calc_incoming_sw(t, meta, tsi, 3, 0.0))
    inc1 = np.asarray(ecckd_mod.calc_incoming_sw(t, meta, tsi, 3, 1.0))
    amp = np.asarray(t["norm_amplitude_solar_irradiance"])
    np.testing.assert_allclose(inc1 - inc0, np.broadcast_to(tsi * amp,
                                                            inc1.shape),
                               rtol=1e-9, atol=1e-12)
    # both integrate to the total solar irradiance
    np.testing.assert_allclose(inc0.sum(-1), tsi, rtol=1e-6)
    np.testing.assert_allclose(inc1.sum(-1), tsi, rtol=1e-6)


def test_solar_cycle_requires_ecckd():
    config = Config(gas_model_sw=GasModel.RRTMG,
                    use_spectral_solar_cycle=True)
    with pytest.raises(ValueError, match="ecCKD"):
        setup_radiation(config, data_dir=DATA_DIR)


def test_spectral_solar_scaling_rrtmg():
    """Per-band scaling applied before the TSI renormalization
    (radiation_ifs_rrtm.F90:543-563)."""
    import jax.numpy as jnp

    from ecrad_tpu.optics import rrtmg, rrtmg_data

    tables = rrtmg.setup_tables()
    ncol, nlev = 4, 20
    p_hl = np.broadcast_to(np.linspace(100.0, 101325.0, nlev + 1),
                           (ncol, nlev + 1)).copy()
    t_hl = np.full((ncol, nlev + 1), 260.0)
    gas = {"h2o": jnp.full((ncol, nlev), 1e-3),
           "co2": jnp.full((ncol, nlev), 6e-4),
           "o3": jnp.full((ncol, nlev), 1e-6)}
    mu = np.full(ncol, 0.6)
    tsi = 1361.0

    def run(scaling):
        r = rrtmg.gas_optics(tables, jnp.asarray(p_hl), jnp.asarray(t_hl),
                             gas, cos_sza=jnp.asarray(mu), do_lw=False,
                             do_sw=True, solar_irradiance=tsi,
                             spectral_solar_scaling=scaling)
        return np.asarray(r.incoming_sw)

    inc_ref = run(None)
    scaling = np.ones(rrtmg_data.NBANDS_SW)
    scaling[3] = 1.5
    inc_scl = run(jnp.asarray(scaling))

    # totals renormalized to TSI in both cases
    np.testing.assert_allclose(inc_ref.sum(-1), tsi, rtol=1e-5)
    np.testing.assert_allclose(inc_scl.sum(-1), tsi, rtol=1e-5)
    # band 3's share grows by 1.5x relative to all other bands
    band = np.asarray(tables["sw_band_from_g"])
    in3 = band == 3
    ratio = (inc_scl[0, in3].sum() / inc_scl[0, ~in3].sum()) \
        / (inc_ref[0, in3].sum() / inc_ref[0, ~in3].sum())
    np.testing.assert_allclose(ratio, 1.5, rtol=1e-5)
