"""Pallas generator-scan kernel vs the lax.scan path: identical random
streams (same per-column threefry draws) => identical od_scaling."""

import numpy as np
import pytest

import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ecrad_tpu.config import Config, Overlap
from ecrad_tpu.solvers.cloud_generator import cloud_generator_device

NCOL, NLEV, NG = 23, 31, 14


def _inputs(seed=0):
    rng = np.random.default_rng(seed)
    frac = rng.uniform(0, 1, (NCOL, NLEV)) \
        * (rng.uniform(0, 1, (NCOL, NLEV)) > 0.4)
    frac[0] = 0.0                                # a cloud-free column
    return (jnp.arange(1, NCOL + 1), jnp.asarray(frac),
            jnp.asarray(rng.uniform(0.3, 0.99, (NCOL, NLEV - 1))),
            jnp.asarray(rng.uniform(0.4, 1.5, (NCOL, NLEV))))


@pytest.mark.parametrize("overlap", [Overlap.EXPONENTIAL_RANDOM,
                                     Overlap.MAXIMUM_RANDOM,
                                     Overlap.EXPONENTIAL])
def test_pallas_generator_matches_scan(monkeypatch, overlap):
    iseed, frac, op, fsd = _inputs()
    cfg = Config(overlap_scheme=overlap)
    from ecrad_tpu.interface import setup_radiation
    from ecrad_tpu.data import DATA_DIR
    cfg, tables = setup_radiation(cfg, data_dir=DATA_DIR)

    monkeypatch.setenv("ECRAD_TPU_ADDING", "scan")
    od_ref, tcc_ref = cloud_generator_device(
        cfg, tables.pdf_sampler, iseed, frac, op, fsd, NG)
    monkeypatch.setenv("ECRAD_TPU_ADDING", "pallas")
    with pltpu.force_tpu_interpret_mode():
        od_got, tcc_got = cloud_generator_device(
            cfg, tables.pdf_sampler, iseed, frac, op, fsd, NG)
    np.testing.assert_array_equal(np.asarray(tcc_got),
                                  np.asarray(tcc_ref))
    np.testing.assert_allclose(np.asarray(od_got), np.asarray(od_ref),
                               rtol=1e-6, atol=1e-7)
