"""Golden-file test: cloudless solver + RRTMG gas optics vs the committed
reference output (test/ifs/Makefile:91-95 test_cloudless)."""

import os

from ecrad_tpu.config import Config, Solver

from . import golden


def test_cloudless_vs_reference():
    config = Config.from_namelist(golden.CONFIG_NAM).replace(
        use_aerosols=False,
        sw_solver=Solver.CLOUDLESS, lw_solver=Solver.CLOUDLESS)
    flux, _ = golden.run_config(config)
    errors = golden.compare(
        flux, os.path.join(golden.TEST_IFS,
                           "ecrad_meridian_cloudless_out_REFERENCE.nc"))
    # LW should be at dp accuracy
    assert errors["flux_up_lw"] < 1e-3
    assert errors["flux_dn_lw"] < 1e-3
