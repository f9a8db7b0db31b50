"""Golden-file test: ecCKD gas optics + general cloud/aerosol optics +
McICA (test/ifs/Makefile:106-109 test_ecckd_mcica)."""

import os

import jax.numpy as jnp

from ecrad_tpu.config import Config, Solver

from . import golden

ECCKD_NAM = os.path.join(golden.TEST_IFS, "configCY49R1_ecckd.nam")


def test_ecckd_mcica_vs_reference():
    from ecrad_tpu.io.input import DriverConfig, read_input

    config = Config.from_namelist(ECCKD_NAM).replace(
        sw_solver=Solver.MCICA, lw_solver=Solver.MCICA,
        # consolidate forces this on when canopy fluxes are requested
        # (radiation_config.F90:1113-1119)
        do_surface_sw_spectral_flux=True)
    dc = DriverConfig.from_namelist(ECCKD_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    extra = {"aerosol": {"mixing_ratio": jnp.asarray(inp.aerosol_mmr)}}
    flux, _ = golden.run_config(config, driver_config=dc,
                                extra_inputs=extra)
    errors = golden.compare(
        flux, os.path.join(golden.TEST_IFS,
                           "ecrad_meridian_ecckd_mcica_out_REFERENCE.nc"))
    print(errors)
