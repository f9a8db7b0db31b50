"""Multi-device column data parallelism as a library feature.

Asserts shard-count invariance of fluxes (SURVEY §4: "add multi-host
tests asserting shard-count invariance") on the 8-device virtual CPU
mesh, and block-size invariance of the NPROMA-style column blocking
(driver/ifs_blocking.F90:328-331 analog).  Both hold exactly (not just
statistically) because the McICA sample is keyed per column."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import __graft_entry__ as ge
from ecrad_tpu import pipeline

ARG_NAMES = ["pressure_hl", "temperature_hl", "gas_mmr", "cos_sza",
             "skin_temperature", "sw_albedo", "sw_albedo_direct",
             "lw_emissivity", "cloud", "aerosol"]


@pytest.fixture(scope="module")
def built():
    step, args = ge._build(ncol=16, dtype="float64")
    return step, dict(zip(ARG_NAMES, args))


def _flux_dict(flux):
    return {k: np.asarray(v) for k, v in
            flux.__dict__.items() if v is not None}


def test_shard_count_invariance(built):
    step, inputs = built
    assert len(jax.devices()) >= 8, "conftest must provision 8 devices"

    ref = jax.jit(step)(*[inputs[k] for k in ARG_NAMES])
    ref = _flux_dict(ref)

    for n_dev in (1, 8):
        mesh = pipeline.make_mesh(n_dev)
        sharded = pipeline.shard_inputs(mesh, dict(inputs), 16)
        cloud = sharded.pop("cloud")
        aerosol = sharded.pop("aerosol")
        out = pipeline.radiation_sharded(
            step.config, step.tables, mesh,
            solar_irradiance=step.solar, cloud=cloud, aerosol=aerosol,
            **sharded)
        out = _flux_dict(out)
        assert set(out) == set(ref)
        for k in ref:
            np.testing.assert_allclose(
                out[k], ref[k], rtol=1e-9, atol=1e-9,
                err_msg=f"{k} differs at n_dev={n_dev}")


def test_shard_count_invariance_nondivisible(built):
    """ncol not divisible by device count → padded internally."""
    step, inputs = built
    mesh = pipeline.make_mesh(8)
    # take 13 columns
    def cut(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == 16:
            return x[:13]
        return x
    small = jax.tree_util.tree_map(cut, dict(inputs))
    ref = jax.jit(step)(*[small[k] for k in ARG_NAMES])
    cloud = small.pop("cloud")
    aerosol = small.pop("aerosol")
    out = pipeline.radiation_sharded(
        step.config, step.tables, mesh, solar_irradiance=step.solar,
        cloud=cloud, aerosol=aerosol, **small)
    np.testing.assert_allclose(np.asarray(out.lw_up),
                               np.asarray(ref.lw_up), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(out.sw_dn),
                               np.asarray(ref.sw_dn), rtol=1e-9)
    assert np.asarray(out.lw_up).shape[0] == 13


def test_block_size_invariance(built):
    """Column blocking must not change results (NPROMA analog)."""
    step, inputs = built
    ref = jax.jit(step)(*[inputs[k] for k in ARG_NAMES])
    ref = _flux_dict(ref)
    kw = dict(inputs)
    cloud = kw.pop("cloud")
    aerosol = kw.pop("aerosol")
    for bs in (5, 8):
        out = jax.jit(lambda c, a, k: pipeline.radiation_blocked(
            step.config, step.tables, solar_irradiance=step.solar,
            block_size=bs, cloud=c, aerosol=a, **k))(cloud, aerosol, kw)
        out = _flux_dict(out)
        assert set(out) == set(ref)
        for k in ref:
            np.testing.assert_allclose(
                out[k], ref[k], rtol=1e-9, atol=1e-9,
                err_msg=f"{k} differs at block_size={bs}")
