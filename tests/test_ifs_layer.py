"""IFS adaptation layer tests (ifs/ directory of the reference):
effective radii, overlap decorrelation, saturation, solar zenith angle,
spectral Planck LUT, and the flat-array radiation_scheme wrapper."""

import numpy as np
import pytest

from tests import golden


class TestParameterizations:
    def test_liquid_effective_radius(self):
        import jax.numpy as jnp
        from ecrad_tpu.ifs import liquid_effective_radius
        p = jnp.full((2, 3), 85000.0)
        t = jnp.full((2, 3), 280.0)
        cf = jnp.full((2, 3), 0.8)
        ql = jnp.full((2, 3), 2e-4)
        qr = jnp.zeros((2, 3))
        land = jnp.array([1.0, 0.0])
        re = np.asarray(liquid_effective_radius(p, t, cf, ql, qr, land))
        assert (re >= 4.0e-6 - 1e-12).all() and (re <= 30.0e-6).all()
        # maritime droplets larger than continental (fewer CCN)
        assert re[1, 0] > re[0, 0]
        # nradlp=0/1 modes
        re0 = np.asarray(liquid_effective_radius(p, t, cf, ql, qr, land,
                                                 nradlp=0))
        assert np.allclose(re0, (10.0 + (100000.0 - 85000.0) * 3.5)
                           * 1e-6)
        re1 = np.asarray(liquid_effective_radius(p, t, cf, ql, qr, land,
                                                 nradlp=1))
        assert np.allclose(re1[0], 10e-6) and np.allclose(re1[1], 13e-6)

    def test_ice_effective_radius(self):
        import jax.numpy as jnp
        from ecrad_tpu.ifs import ice_effective_radius
        p = jnp.full((2, 3), 40000.0)
        t = jnp.full((2, 3), 230.0)
        cf = jnp.full((2, 3), 0.5)
        qi = jnp.full((2, 3), 1e-5)
        qs = jnp.zeros((2, 3))
        sin_lat = jnp.array([0.0, 0.9])
        re = np.asarray(ice_effective_radius(p, t, cf, qi, qs, sin_lat))
        assert (re > 5e-6).all() and (re < 120e-6).all()
        # warmer ice -> larger particles (Sun & Rikus T dependence)
        re_warm = np.asarray(ice_effective_radius(
            p, jnp.full((2, 3), 255.0), cf, qi, qs, sin_lat))
        assert re_warm[0, 0] > re[0, 0]

    def test_decorr_len(self):
        from ecrad_tpu.ifs import cloud_overlap_decorr_len
        sin_lat = np.array([0.0, 0.5, 0.9])
        e2, w2, r2 = cloud_overlap_decorr_len(sin_lat, ndecolat=2)
        assert np.allclose(np.asarray(e2)[0], 0.75 + 2.149)
        assert np.asarray(e2)[2] < np.asarray(e2)[0]  # shorter at poles
        e1, _, _ = cloud_overlap_decorr_len(sin_lat, ndecolat=1)
        assert np.allclose(np.asarray(e1)[0], 2.899)
        e0, w0, r0 = cloud_overlap_decorr_len(sin_lat, ndecolat=0)
        assert np.allclose(np.asarray(e0), 2.0) and r0 == 0.5

    def test_satur(self):
        import jax.numpy as jnp
        from ecrad_tpu.ifs import satur
        qsat = np.asarray(satur(jnp.array([[100000.0]]),
                                jnp.array([[300.0]])))
        # ~3.5 kPa vapour pressure at 300K -> qsat ~ 0.022
        assert 0.020 < qsat[0, 0] < 0.026
        qsat_cold = np.asarray(satur(jnp.array([[100000.0]]),
                                     jnp.array([[230.0]])))
        assert qsat_cold[0, 0] < 1e-4

    def test_cos_sza(self):
        import jax.numpy as jnp
        from ecrad_tpu.ifs import cos_solar_zenith_angle
        sin_lat = jnp.array([0.0, 0.5, -0.5])
        lon = jnp.array([np.pi, np.pi, np.pi])  # hour angle 0 (noon)
        # equinox (declination 0), solar time 0
        mu0 = np.asarray(cos_solar_zenith_angle(sin_lat, lon, 0.0, 1.0,
                                                0.0))
        assert np.isclose(mu0[0], 1.0)          # overhead at equator
        assert np.isclose(mu0[1], np.sqrt(1 - 0.25))
        # night side
        mu0n = np.asarray(cos_solar_zenith_angle(
            sin_lat, jnp.zeros(3), 0.0, 1.0, 0.0))
        assert (mu0n <= 1e-12).all()
        # averaged formula approaches instantaneous for tiny window
        mu0a = np.asarray(cos_solar_zenith_angle(
            sin_lat, lon, 0.0, 1.0, 0.0, average_over=1e-5))
        np.testing.assert_allclose(mu0a, mu0, atol=1e-6)

    def test_spectral_planck(self):
        import jax.numpy as jnp
        from ecrad_tpu.ifs import SpectralPlanck
        sp = SpectralPlanck([8e-6, 13e-6], [1, 2, 3])
        t = jnp.array([220.0, 280.0, 310.0])
        p = np.asarray(sp.calc(t))
        sigma_t4 = 5.67037321e-8 * np.asarray(t) ** 4
        np.testing.assert_allclose(p.sum(-1), sigma_t4, rtol=1e-10)
        assert (p > 0.0).all()
        # 8-13um window fraction peaks in the middle interval at 280K
        assert p[1, 1] / sigma_t4[1] > 0.25
        # single interval = Stefan-Boltzmann
        sp1 = SpectralPlanck([], [1], nintervals=1)
        np.testing.assert_allclose(np.asarray(sp1.calc(t))[:, 0],
                                   sigma_t4)


def test_radiation_scheme_wrapper():
    """Flat-array wrapper reproduces the core scheme on meridian data."""
    import jax.numpy as jnp
    from ecrad_tpu.config import Config
    from ecrad_tpu.namelist import read_namelist_file
    from ecrad_tpu.ifs import radiation_scheme
    from ecrad_tpu.ifs.scheme import setup_radiation_scheme
    from ecrad_tpu.io.input import DriverConfig, read_input
    from ecrad_tpu import constants

    nml = dict(read_namelist_file(golden.CONFIG_NAM)["radiation"])
    cfg = Config.from_dict(nml)
    scheme = setup_radiation_scheme(cfg, data_dir="/root/reference/data")
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)

    ncol, nlev1 = inp.thermodynamics.pressure_hl.shape
    nlev = nlev1 - 1
    phl = inp.thermodynamics.pressure_hl
    thl = inp.thermodynamics.temperature_hl
    p_fl = 0.5 * (phl[:, :-1] + phl[:, 1:])
    t_fl = 0.5 * (thl[:, :-1] + thl[:, 1:])
    g = lambda name: inp.gas_mmr[:, :, constants.GAS_INDEX[name]]

    out = radiation_scheme(
        scheme,
        solar_irradiance=float(inp.solar_irradiance),
        mu0=inp.cos_sza, skin_temperature=inp.skin_temperature,
        albedo_diffuse=inp.sw_albedo, albedo_direct=inp.sw_albedo_direct,
        spectral_emissivity=inp.lw_emissivity,
        sin_lat=np.zeros(ncol), lon=np.zeros(ncol),
        land_frac=np.zeros(ncol),
        pressure_fl=p_fl, temperature_fl=t_fl,
        pressure_hl=phl, temperature_hl=thl,
        q=g("h2o"), co2=g("co2"), ch4=g("ch4"), n2o=g("n2o"),
        no2=g("no2"), cfc11=g("cfc11"), cfc12=g("cfc12"),
        hcfc22=g("hcfc22"), ccl4=g("ccl4"), o3=g("o3"),
        cloud_frac=inp.cloud_fraction,
        q_liquid=inp.cloud_mixing_ratio[:, :, 0],
        q_ice=inp.cloud_mixing_ratio[:, :, 1],
        q_rain=np.zeros((ncol, nlev)), q_snow=np.zeros((ncol, nlev)),
        aerosol_mmr=inp.aerosol_mmr, iseed=inp.iseed)

    for k in ("flux_sw", "flux_lw", "flux_sw_clear", "flux_lw_clear"):
        v = np.asarray(out[k])
        assert v.shape == (ncol, nlev + 1)
        assert np.isfinite(v).all(), k
    # net SW is downward (positive), net LW cools the surface upward
    assert (np.asarray(out["flux_sw"]) >= -1e-6).all()
    assert (np.asarray(out["flux_lw"])[:, 0] < 0.0).all()
    # UV + PAR below total downwelling SW at surface
    assert (np.asarray(out["flux_uv"]) >= 0.0).all()
    assert (np.asarray(out["flux_par"]) >= 0.0).all()
    assert (np.asarray(out["flux_par"])
            <= np.asarray(out["flux_sw_dn_surf"]) + 1e-6).all()
    day = np.asarray(inp.cos_sza) > 0.1
    assert (np.asarray(out["flux_par"])[day] > 1.0).all()
    # emissivity diagnostic within its clamp
    e = np.asarray(out["emissivity_out"])
    assert ((e >= 0.8) & (e <= 0.995)).all()
    assert np.isfinite(np.asarray(out["flux_dir_into_sun"])).all()
