"""Bundled data files (coefficient LUTs from the ecRad data distribution,
plus the extracted RRTMG k-distribution cache rrtmg.npz)."""

import os

DATA_DIR = os.path.dirname(os.path.abspath(__file__))
MERIDIAN_INPUT = os.path.join(DATA_DIR, "io", "ecrad_meridian.nc")
