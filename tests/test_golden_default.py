"""Golden-file test: full CY49R1 default configuration — McICA + clouds +
general aerosol optics (test/ifs/Makefile:34-35 test_default)."""

import os

import numpy as np

from ecrad_tpu.config import Config

from . import golden


def run_default():
    import jax.numpy as jnp

    config = Config.from_namelist(golden.CONFIG_NAM)
    from ecrad_tpu.io.input import DriverConfig, read_input
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    extra = {"aerosol": {"mixing_ratio": jnp.asarray(inp.aerosol_mmr)}}
    flux, _ = golden.run_config(config, extra_inputs=extra)
    return flux


def test_default_vs_reference():
    flux = run_default()
    errors = golden.compare(
        flux, os.path.join(golden.TEST_IFS,
                           "ecrad_meridian_default_out_REFERENCE.nc"))
    print(errors)
