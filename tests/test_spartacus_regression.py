"""SPARTACUS self-regression goldens.

Upstream XFAILs its SPARTACUS validation (test/ifs/CMakeLists.txt:
257-278), so 3D physics here is pinned against stored outputs of this
framework's own validated state (see tools/make_spartacus_golden.py).
If a refactor changes these fluxes, either it introduced a bug or the
physics deliberately improved — in the latter case regenerate the file
and explain the change in the commit message.
"""

import os

import numpy as np
import pytest

from tests import golden
from tests.test_spartacus import make_config

GOLDEN_NPZ = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "data", "spartacus_selfreg.npz")

# rounding drift across BLAS/XLA versions is ~1e-12 relative; 1e-4
# W m-2 catches any real physics change while tolerating compiler noise
TOL = 1.0e-4

CONFIGS = {
    "explicit": {},
    "maximum": {"sw_entrapment_name": "Maximum"},
    "edge_only": {"sw_entrapment_name": "Edge-only"},
}


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_spartacus_self_regression(name):
    if not os.path.exists(GOLDEN_NPZ):
        pytest.skip("run tools/make_spartacus_golden.py first")
    ref = np.load(GOLDEN_NPZ)
    flux, _ = golden.run_config(make_config(**CONFIGS[name]))
    checked = 0
    for key in ref.files:
        cfg, field = key.split("/")
        if cfg != name:
            continue
        mine = getattr(flux, field, None)
        assert mine is not None, f"{field} missing from flux"
        err = np.abs(np.asarray(mine, np.float64) - ref[key]).max()
        assert err < TOL, f"{name}/{field}: max abs drift {err}"
        checked += 1
    assert checked >= 10
