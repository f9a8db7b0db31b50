"""Golden-file test: McICA with exponential-exponential overlap
(test/ifs/Makefile:56-59 test_expexp)."""

import os

import jax.numpy as jnp

from ecrad_tpu.config import Config, Overlap

from . import golden


def test_expexp_vs_reference():
    from ecrad_tpu.io.input import DriverConfig, read_input

    config = Config.from_namelist(golden.CONFIG_NAM).replace(
        overlap_scheme=Overlap.EXPONENTIAL)
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    extra = {"aerosol": {"mixing_ratio": jnp.asarray(inp.aerosol_mmr)}}
    flux, _ = golden.run_config(config, extra_inputs=extra)
    errors = golden.compare(
        flux, os.path.join(golden.TEST_IFS,
                           "ecrad_meridian_expexp_out_REFERENCE.nc"))
    print(errors)
