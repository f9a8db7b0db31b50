"""Homogeneous solver validation (radiation_homogeneous_lw/sw.F90).

The homogeneous solver treats every cloudy profile as fully overcast
plane-parallel cloud (no fraction, no inhomogeneity).  It is implemented
as the McICA reduction with od_scaling == 1 and scene weight 1
(interface.py HOMOGENEOUS dispatch).  Cross-validation: on a profile
that is *already* fully overcast with zero fractional standard
deviation, Tripleclouds degenerates to the same plane-parallel problem
(its three regions collapse: clear region weight 0, both cloudy regions
get identical optical depth when FSD=0), so both solvers must agree to
roundoff — an independent code path through region partitioning,
overlap matrices and its own adding scheme."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from ecrad_tpu import pipeline
from ecrad_tpu.config import Solver

ARG_NAMES = ["pressure_hl", "temperature_hl", "gas_mmr", "cos_sza",
             "skin_temperature", "sw_albedo", "sw_albedo_direct",
             "lw_emissivity", "cloud", "aerosol"]


def _run(solver_name, inputs, step):
    config = step.config.replace(
        sw_solver=Solver[solver_name], lw_solver=Solver[solver_name],
        # derived flag normally set by setup_radiation
        # (radiation_config.F90:1351-1356): homogeneous solvers take
        # gridbox-mean (not in-cloud) water in cloud optics
        is_homogeneous=(solver_name == "HOMOGENEOUS"),
        overlap_scheme=step.config.overlap_scheme)
    kw = dict(inputs)
    cloud = dict(kw.pop("cloud"))
    aerosol = kw.pop("aerosol")
    flux = jax.jit(lambda c, a, k: pipeline.radiation_step(
        config, step.tables, solar_irradiance=step.solar,
        cloud=c, aerosol=a, **k))(cloud, aerosol, kw)
    return flux


@pytest.fixture(scope="module")
def overcast():
    step, args = ge._build(ncol=8, dtype="float64")
    inputs = dict(zip(ARG_NAMES, args))
    cloud = dict(inputs["cloud"])
    # fully overcast wherever there is condensate; zero inhomogeneity
    has_water = (cloud["q_liq"] + cloud["q_ice"]) > 1e-9
    cloud["fraction"] = jnp.where(has_water, 1.0, 0.0)
    cloud["fractional_std"] = jnp.zeros_like(cloud["fractional_std"])
    inputs["cloud"] = cloud
    return step, inputs


def test_homogeneous_equals_tripleclouds_overcast(overcast):
    step, inputs = overcast
    hom = _run("HOMOGENEOUS", inputs, step)
    tc = _run("TRIPLECLOUDS", inputs, step)
    for name in ("lw_up", "lw_dn", "sw_up", "sw_dn", "sw_dn_direct"):
        h = np.asarray(getattr(hom, name))
        t = np.asarray(getattr(tc, name))
        # same physics, independent solver path: tight but not bitwise
        np.testing.assert_allclose(h, t, rtol=2e-6, atol=2e-6,
                                   err_msg=name)


def test_homogeneous_ignores_fraction(overcast):
    """The homogeneous solver must not depend on cloud_fraction values
    (any nonzero fraction is treated as overcast,
    radiation_homogeneous_lw.F90)."""
    step, inputs = overcast
    a = _run("HOMOGENEOUS", inputs, step)
    half = dict(inputs)
    cloud = dict(half["cloud"])
    cloud["fraction"] = cloud["fraction"] * 0.5
    half["cloud"] = cloud
    b = _run("HOMOGENEOUS", half, step)
    np.testing.assert_allclose(np.asarray(a.lw_up), np.asarray(b.lw_up),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(a.sw_dn), np.asarray(b.sw_dn),
                               rtol=1e-12)
