"""RRTMG k-distribution table loading.

Tables are extracted from the reference data files by
tools/extract_rrtmg.py into ``ecrad_tpu/data/rrtmg.npz`` (g-point-reduced:
140 LW g-points over 16 bands, 112 SW g-points over 14 bands — the
operational RRTMG-IFS configuration, ifsrrtm/yoerrtm.F90:58,
ifsrrtm/yoesrtm.F90:41).

At setup the tables become one flat dict of jnp arrays (an HBM-resident
pytree replicated across the device mesh); band structure metadata lives in
`RRTMGMeta` (static, hashable).
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Tuple

import numpy as np

_NPZ_PATH = os.path.join(os.path.dirname(__file__), "..", "data",
                         "rrtmg.npz")

NBANDS_LW = 16
NBANDS_SW = 14
NG_LW = 140
NG_SW = 112

# LW band bounds in cm-1 (radiation_ifs_rrtm.F90:160-165
# allocate_bands_only call — RRTMG v4.85 band 1 spans 10-350)
LW_WAVENUM1 = np.array([10., 350., 500., 630., 700., 820., 980., 1080.,
                        1180., 1390., 1480., 1800., 2080., 2250., 2380.,
                        2600.])
LW_WAVENUM2 = np.array([350., 500., 630., 700., 820., 980., 1080., 1180.,
                        1390., 1480., 1800., 2080., 2250., 2380., 2600.,
                        3250.])
# SW band bounds in cm-1 (ifsrrtm/susrtm.F90 WAVENUM1/2 comments); band 14
# (index 13) is the 820-2600 cm-1 band that wraps around
SW_WAVENUM1 = np.array([2600., 3250., 4000., 4650., 5150., 6150., 7700.,
                        8050., 12850., 16000., 22650., 29000., 38000.,
                        820.])
SW_WAVENUM2 = np.array([3250., 4000., 4650., 5150., 6150., 7700., 8050.,
                        12850., 16000., 22650., 29000., 38000., 50000.,
                        2600.])


@dataclasses.dataclass(frozen=True)
class RRTMGMeta:
    """Static band-structure metadata (hashable; jit-static)."""
    ng_lw: int = NG_LW
    ng_sw: int = NG_SW
    nbands_lw: int = NBANDS_LW
    nbands_sw: int = NBANDS_SW
    # per-band g-point counts
    ngc_lw: Tuple[int, ...] = ()
    ngc_sw: Tuple[int, ...] = ()


@functools.lru_cache(maxsize=1)
def load_tables(path: str = _NPZ_PATH):
    """Load the extracted tables as a plain dict of numpy arrays."""
    with np.load(path) as z:
        return {k: z[k] for k in z.files}


@functools.lru_cache(maxsize=1)
def meta(path: str = _NPZ_PATH) -> RRTMGMeta:
    t = load_tables(path)
    return RRTMGMeta(
        ngc_lw=tuple(int(x) for x in t["lw_ngc"]),
        ngc_sw=tuple(int(x) for x in t["sw_ngc"]),
    )


def band_from_g_lw(path: str = _NPZ_PATH) -> np.ndarray:
    return load_tables(path)["lw_band_from_g"]


def band_from_g_sw(path: str = _NPZ_PATH) -> np.ndarray:
    return load_tables(path)["sw_band_from_g"]
