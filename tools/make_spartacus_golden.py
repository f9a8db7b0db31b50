#!/usr/bin/env python3
"""Generate SPARTACUS self-regression goldens.

Upstream XFAILs its SPARTACUS validation (test/ifs/CMakeLists.txt:
257-278) and ships no golden file, so our 3D physics is pinned by
*self*-regression: this tool runs the SPARTACUS configurations whose
structural tests pass today (tests/test_spartacus.py: equivalence with
Tripleclouds under no-3D/Zero-entrapment, i3rc 3D signatures) and
stores the fluxes in tests/data/spartacus_selfreg.npz.
tests/test_spartacus_regression.py then fails if a performance refactor
silently changes the 3D physics.

Run from the repo root:  python tools/make_spartacus_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import tests.conftest  # noqa: F401  (forces CPU + f64)

import numpy as np

from tests import golden
from tests.test_spartacus import make_config

FIELDS = ("lw_up", "lw_dn", "lw_up_clear", "lw_dn_clear",
          "sw_up", "sw_dn", "sw_dn_direct",
          "sw_up_clear", "sw_dn_clear", "sw_dn_direct_clear",
          "cloud_cover_sw", "cloud_cover_lw", "lw_derivatives")

CONFIGS = {
    # default CY49R1-style 3D: Explicit entrapment
    "explicit": {},
    # the reference's test_spartacus_maxentr variant
    # (test/ifs/Makefile:81-84)
    "maximum": {"sw_entrapment_name": "Maximum"},
    # no horizontal transport but entrapment on
    "edge_only": {"sw_entrapment_name": "Edge-only"},
}


def main():
    out = {}
    for name, over in CONFIGS.items():
        print(f"running spartacus[{name}] ...", flush=True)
        flux, _ = golden.run_config(make_config(**over))
        for f in FIELDS:
            v = getattr(flux, f, None)
            if v is not None:
                out[f"{name}/{f}"] = np.asarray(v, np.float64)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "..", "tests", "data", "spartacus_selfreg.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    np.savez_compressed(path, **out)
    print(f"wrote {os.path.normpath(path)} with {len(out)} arrays")


if __name__ == "__main__":
    main()
