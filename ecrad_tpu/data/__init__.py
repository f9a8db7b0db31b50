"""Bundled data files (coefficient LUTs from the ecRad data distribution,
plus the extracted RRTMG k-distribution cache rrtmg.npz)."""

import os

DATA_DIR = os.path.dirname(os.path.abspath(__file__))
MERIDIAN_INPUT = os.path.join(DATA_DIR, "io", "ecrad_meridian.nc")


def find_data_file(directory_name: str, filename: str) -> str:
    """Resolve a data file: absolute path as-is; otherwise try the
    configured directory, then the bundled package data."""
    if filename.startswith("/"):
        return filename
    cand = os.path.join(directory_name, filename)
    if os.path.exists(cand):
        return cand
    bundled = os.path.join(DATA_DIR, filename)
    if os.path.exists(bundled):
        return bundled
    return cand  # let the open() raise with the configured path
