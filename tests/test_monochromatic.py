"""Monochromatic gas/cloud optics tests (radiation_monochromatic.F90)."""

import numpy as np
import pytest


def _run(cos_sza, mono_lw_wavelength=-1.0, with_cloud=True, **cfg_over):
    import jax.numpy as jnp
    from ecrad_tpu.config import Config
    from ecrad_tpu.interface import radiation, setup_radiation

    cfg = Config.from_dict({
        "gas_model_name": "Monochromatic",
        "sw_solver_name": "Homogeneous", "lw_solver_name": "Homogeneous",
        "mono_lw_total_od": 1.0, "mono_sw_total_od": 0.2,
        "mono_lw_wavelength": mono_lw_wavelength,
        "use_aerosols": False, **cfg_over,
    })
    cfg, tables = setup_radiation(cfg, data_dir="/root/reference/data")
    ncol, nlev = len(cos_sza), 20
    phl = np.linspace(1.0, 1013e2, nlev + 1)[None, :].repeat(ncol, 0)
    thl = np.linspace(220.0, 290.0, nlev + 1)[None, :].repeat(ncol, 0)
    frac = np.zeros((ncol, nlev))
    if with_cloud:
        frac[:, 12:16] = 0.8
    cloud = {"fraction": jnp.asarray(frac),
             "q_liq": jnp.asarray(frac * 1e-4),
             "q_ice": jnp.zeros((ncol, nlev)),
             "re_liq": jnp.full((ncol, nlev), 1e-5),
             "re_ice": jnp.full((ncol, nlev), 3e-5),
             "overlap_param": jnp.full((ncol, nlev - 1), 0.8),
             "fractional_std": jnp.zeros((ncol, nlev))}
    flux = radiation(
        cfg, tables,
        pressure_hl=jnp.asarray(phl), temperature_hl=jnp.asarray(thl),
        gas_mmr=jnp.zeros((ncol, nlev, 12)),
        cos_sza=jnp.asarray(cos_sza),
        skin_temperature=jnp.full(ncol, 290.0),
        sw_albedo=jnp.full((ncol, 1), 0.08),
        sw_albedo_direct=jnp.full((ncol, 1), 0.08),
        lw_emissivity=jnp.full((ncol, 1), 0.98),
        solar_irradiance=1366.0, cloud=cloud)
    return flux


def test_sw_toa_and_night():
    flux = _run([1.0, 0.5, 0.1, 0.0])
    np.testing.assert_allclose(np.asarray(flux.sw_dn)[:, 0],
                               [1366.0, 683.0, 136.6, 0.0], rtol=1e-12)
    assert (np.asarray(flux.sw_up)[-1] == 0.0).all()
    up = np.asarray(flux.sw_up)
    dn = np.asarray(flux.sw_dn)
    assert (up[:, 0] <= dn[:, 0]).all()
    assert np.isfinite(up).all() and np.isfinite(dn).all()


def test_lw_bounded_by_planck():
    flux = _run([0.5])
    sigma_t4_surf = 5.67037321e-8 * 290.0 ** 4
    olr = np.asarray(flux.lw_up)[0, 0]
    assert 0.0 < olr < sigma_t4_surf
    # downwelling at surface below the warmest Planck emission
    assert 0.0 < np.asarray(flux.lw_dn)[0, -1] < sigma_t4_surf


def test_lw_single_wavelength_mode():
    flux = _run([0.5], mono_lw_wavelength=10.0e-6)
    assert np.isfinite(np.asarray(flux.lw_up)).all()
    assert (np.asarray(flux.lw_up) > 0.0).all()
    # pi * B_lambda(10um, 290K) ~ 9.9 W m-2 um-1 * ... just check scale
    # differs hugely from the broadband run
    broadband = _run([0.5], mono_lw_wavelength=-1.0)
    assert not np.allclose(np.asarray(flux.lw_up),
                           np.asarray(broadband.lw_up))


def test_cloud_increases_sw_up():
    cloudy = _run([0.5])
    clear = _run([0.5], with_cloud=False)
    assert (np.asarray(cloudy.sw_up)[0, 0]
            > np.asarray(clear.sw_up)[0, 0])
