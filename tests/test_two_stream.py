"""Numerical sanity tests for the two-stream + adding core.

Checks conservation and limiting behaviour that the reference formulas
guarantee (radiation_two_stream.F90, radiation_adding_ica_*.F90).
"""

import jax.numpy as jnp
import numpy as np

from ecrad_tpu.solvers import adding, two_stream


def test_lw_ref_trans_conservative_limit():
    # ssa=1, g=0: no absorption → R + T = 1
    od = jnp.array([0.5, 2.0, 10.0])
    ssa = jnp.full(3, 0.9999999)
    g = jnp.zeros(3)
    pl = jnp.full(3, 100.0)
    r, t, su, sd = two_stream.lw_ref_trans(od, ssa, g, pl, pl)
    np.testing.assert_allclose(np.asarray(r + t), 1.0, atol=1e-5)


def test_lw_no_scattering_emission_balance():
    # Isothermal, optically thick layer: source_up -> planck
    od = jnp.array([50.0])
    pl = jnp.array([123.0])
    t, su, sd = two_stream.lw_no_scattering_trans(od, pl, pl)
    np.testing.assert_allclose(float(su[0]), 123.0, rtol=1e-6)
    np.testing.assert_allclose(float(t[0]), 0.0, atol=1e-20)


def test_sw_ref_trans_energy():
    # All scattered+transmitted energy fractions within [0,1] and
    # absorption non-negative
    mu0 = jnp.array(0.6)
    od = jnp.array([0.01, 0.5, 3.0, 30.0])
    ssa = jnp.array([0.2, 0.9, 0.999999, 0.5])
    g = jnp.array([0.0, 0.5, 0.85, 0.7])
    rd, td, rdir, tdd, tdirdir = two_stream.sw_ref_trans(mu0, od, ssa, g)
    for x in (rd, td, tdirdir):
        assert np.all(np.asarray(x) >= 0.0) and np.all(np.asarray(x) <= 1.0)
    # direct quantities normalized by beam: <= mu0
    assert np.all(np.asarray(rdir + tdd) <= float(mu0) + 1e-12)


def test_sw_conservative_scattering_closure():
    # Conservative scattering (ssa=1): R_diff + T_diff = 1
    mu0 = jnp.array(0.5)
    od = jnp.array([1.0, 5.0])
    ssa = jnp.array([1.0 - 1e-12, 1.0 - 1e-12])
    g = jnp.array([0.5, 0.5])
    rd, td, *_ = two_stream.sw_ref_trans(mu0, od, ssa, g)
    np.testing.assert_allclose(np.asarray(rd + td), 1.0, atol=1e-6)


def test_adding_sw_energy_conservation():
    # Non-absorbing atmosphere over black surface: net in == net out
    ncol, nlev, ng = 2, 10, 4
    rng = np.random.RandomState(0)
    mu0 = jnp.array([[0.7], [0.3]])
    od = jnp.asarray(rng.uniform(0.01, 1.0, (ncol, nlev, ng)))
    ssa = jnp.full((ncol, nlev, ng), 1.0 - 1e-12)
    g = jnp.asarray(rng.uniform(0.0, 0.8, (ncol, nlev, ng)))
    rd, td, rdir, tdd, t0 = two_stream.sw_ref_trans(mu0[:, :, None], od,
                                                    ssa, g)
    incoming = jnp.ones((ncol, ng)) * 1000.0
    alb = jnp.zeros((ncol, ng))
    fup, fdn_diff, fdn_dir = adding.adding_sw(
        incoming, alb, alb, mu0, rd, td, rdir, tdd, t0)
    # TOA: incoming*mu0 (horizontal plane) = up at TOA + absorbed at sfc
    toa_in = 1000.0 * np.asarray(mu0)[:, 0]
    toa_up = np.asarray(fup)[:, 0, :]
    sfc_dn = np.asarray(fdn_diff + fdn_dir)[:, -1, :]
    np.testing.assert_allclose(
        toa_up + sfc_dn, np.broadcast_to(toa_in[:, None], toa_up.shape),
        rtol=1e-6)


def test_adding_lw_isothermal_blackbody():
    # Isothermal non-scattering atmosphere + black surface at the same
    # temperature: upwelling flux must equal the Planck flux at every level
    # (Kirchhoff: emissivity = absorptivity). With scattering this would NOT
    # hold near TOA because layers reflect the cold sky downward.
    ncol, nlev, ng = 1, 20, 3
    planck = 250.0
    od = jnp.full((ncol, nlev, ng), 0.4)
    ssa = jnp.zeros((ncol, nlev, ng))
    g = jnp.full((ncol, nlev, ng), 0.2)
    pl = jnp.full((ncol, nlev, ng), planck)
    r, t, su, sd = two_stream.lw_ref_trans(od, ssa, g, pl, pl)
    emission = jnp.full((ncol, ng), planck)
    albedo = jnp.zeros((ncol, ng))
    fup, fdn = adding.adding_lw(r, t, su, sd, emission, albedo)
    # Upwelling everywhere = planck (perfect blackbody enclosure from below)
    np.testing.assert_allclose(np.asarray(fup), planck, rtol=1e-6)
    # Downwelling at surface should approach planck for thick atmosphere
    np.testing.assert_allclose(np.asarray(fdn)[:, -1, :], planck, rtol=1e-3)


def test_lw_no_scattering_matches_adding_when_no_scatter():
    ncol, nlev, ng = 2, 15, 5
    rng = np.random.RandomState(1)
    od = jnp.asarray(rng.uniform(0.01, 2.0, (ncol, nlev, ng)))
    pl_hl = jnp.asarray(rng.uniform(50, 150, (ncol, nlev + 1, ng)))
    t, su, sd = two_stream.lw_no_scattering_trans(
        od, pl_hl[:, :-1], pl_hl[:, 1:])
    emission = jnp.asarray(rng.uniform(100, 200, (ncol, ng)))
    albedo = jnp.zeros((ncol, ng))
    fup1, fdn1 = adding.lw_no_scattering(t, su, sd, emission, albedo)
    # adding with zero reflectance should agree
    r0 = jnp.zeros_like(t)
    fup2, fdn2 = adding.adding_lw(r0, t, su, sd, emission, albedo)
    np.testing.assert_allclose(np.asarray(fup1), np.asarray(fup2),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(fdn1), np.asarray(fdn2),
                               rtol=1e-12)
