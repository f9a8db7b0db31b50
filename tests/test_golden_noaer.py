"""Golden-file test: McICA solver + clouds, no aerosols, vs the committed
reference (test/ifs/Makefile:50-53 test_noaer).  Uses the bit-exact
host-side cloud generator so fluxes are directly comparable at the
reference's dp thresholds."""

import os

from ecrad_tpu.config import Config

from . import golden


def test_noaer_vs_reference():
    config = Config.from_namelist(golden.CONFIG_NAM).replace(
        use_aerosols=False)
    flux, _ = golden.run_config(config)
    errors = golden.compare(
        flux, os.path.join(golden.TEST_IFS,
                           "ecrad_meridian_noaer_out_REFERENCE.nc"))
    print(errors)
