"""Pallas sweep kernels vs the sequential-scan adding implementations.

The Pallas kernels (solvers/pallas_adding.py) implement the identical
recurrences (radiation_adding_ica_sw.F90:24-153,
radiation_adding_ica_lw.F90:32-334) in the same operation order as the
lax.scan path, so in float64 interpret mode they must agree to roundoff.
Shapes deliberately exercise column padding (ncol=37 → 128 lanes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ecrad_tpu.solvers import adding

NCOL, NLEV, NG = 37, 21, 9


@pytest.fixture()
def props():
    rng = np.random.default_rng(0)

    def u(*shape, lo=0.0, hi=1.0):
        return jnp.asarray(rng.uniform(lo, hi, shape))

    trans = u(NCOL, NLEV, NG, lo=0.05, hi=0.9)
    refl = u(NCOL, NLEV, NG, lo=0.0, hi=0.3)
    # keep refl + trans <= 1 (passive layers)
    refl = jnp.minimum(refl, 1.0 - trans - 0.01)
    refl = jnp.maximum(refl, 0.0)
    return dict(
        refl=refl, trans=trans,
        s_up=u(NCOL, NLEV, NG, hi=5.0), s_dn=u(NCOL, NLEV, NG, hi=5.0),
        rdir=u(NCOL, NLEV, NG, hi=0.2), tdd=u(NCOL, NLEV, NG, hi=0.2),
        tdirdir=u(NCOL, NLEV, NG, lo=0.1, hi=0.95),
        emission=u(NCOL, NG, hi=10.0), albedo=u(NCOL, NG, hi=0.4),
        alb_dir=u(NCOL, NG, hi=0.4),
        incoming=u(NCOL, NG, hi=100.0),
        mu0=u(NCOL, 1, lo=0.05, hi=1.0),
    )


def _cmp(a, b, name):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-12, atol=1e-12, err_msg=name)


def _fields(out_p, out_s):
    for name in out_s._fields:
        a, b = getattr(out_p, name), getattr(out_s, name)
        if b is None:
            assert a is None, name
            continue
        _cmp(a, b, name)


def test_lw_scat(props, monkeypatch):
    p = props
    args = (p["refl"], p["trans"], p["s_up"], p["s_dn"], p["emission"],
            p["albedo"])
    monkeypatch.setenv("ECRAD_TPU_ADDING", "scan")
    ref = adding.adding_lw_reduced(*args)
    monkeypatch.setenv("ECRAD_TPU_ADDING", "pallas")
    with pltpu.force_tpu_interpret_mode():
        got = adding.adding_lw_reduced(*args)
    _fields(got, ref)


def test_lw_noscat(props, monkeypatch):
    p = props
    args = (p["trans"], p["s_up"], p["s_dn"], p["emission"], p["albedo"])
    monkeypatch.setenv("ECRAD_TPU_ADDING", "scan")
    ref = adding.lw_no_scattering_reduced(*args)
    monkeypatch.setenv("ECRAD_TPU_ADDING", "pallas")
    with pltpu.force_tpu_interpret_mode():
        got = adding.lw_no_scattering_reduced(*args)
    _fields(got, ref)


def test_sw(props, monkeypatch):
    p = props
    args = (p["incoming"], p["albedo"], p["alb_dir"], p["mu0"], p["refl"],
            p["trans"], p["rdir"], p["tdd"], p["tdirdir"])
    monkeypatch.setenv("ECRAD_TPU_ADDING", "scan")
    ref = adding.adding_sw_reduced(*args)
    monkeypatch.setenv("ECRAD_TPU_ADDING", "pallas")
    with pltpu.force_tpu_interpret_mode():
        got = adding.adding_sw_reduced(*args)
    _fields(got, ref)
