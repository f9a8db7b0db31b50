"""Cloud optical properties on the RRTMG band structure.

Reference: radiation/radiation_cloud_optics.F90 (setup L33, run L218),
radiation_liquid_optics_socrates.F90, radiation_liquid_optics_slingo.F90,
radiation_ice_optics_fu.F90, radiation_ice_optics_yi.F90.

Vectorized over (ncol, nlev) with bands last; coefficient tables are tiny
(nband × ~16) and live in VMEM after fusion.
"""

from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ecrad_tpu.config import Config, IceModel, LiquidModel
from ecrad_tpu.constants import ACCEL_GRAVITY

# File names per model (radiation_config.F90 consolidate: file names derived
# from model names)
LIQ_OPTICS_FILE = {
    LiquidModel.SOCRATES: "socrates_droplet_scattering_rrtm.nc",
    LiquidModel.SLINGO: "slingo_droplet_scattering_rrtm.nc",
}
ICE_OPTICS_FILE = {
    IceModel.FU: "fu_ice_scattering_rrtm.nc",
    IceModel.BARAN: "baran_ice_scattering_rrtm.nc",
    IceModel.BARAN2016: "baran2016_ice_scattering_rrtm.nc",
    IceModel.BARAN2017: "baran2017_ice_scattering_rrtm.nc",
    IceModel.YI: "yi_ice_scattering_rrtm.nc",
}


def setup_cloud_optics(config: Config, data_dir: str) -> Dict:
    """Load band-wise liquid/ice coefficient tables (numpy)."""
    from ecrad_tpu.io.netcdf import NcFile

    if config.liq_optics_override_file_name:
        liq_file = config.liq_optics_override_file_name
    else:
        liq_file = LIQ_OPTICS_FILE[config.liquid_model]
    if config.ice_optics_override_file_name:
        ice_file = config.ice_optics_override_file_name
    else:
        ice_file = ICE_OPTICS_FILE[config.ice_model]

    from ecrad_tpu.data import find_data_file

    out = {}
    with NcFile(find_data_file(data_dir, liq_file)) as f:
        out["liq_coeff_lw"] = f.get("coeff_lw")   # (nband_lw, ncoeff)
        out["liq_coeff_sw"] = f.get("coeff_sw")
    with NcFile(find_data_file(data_dir, ice_file)) as f:
        out["ice_coeff_lw"] = f.get("coeff_lw")
        out["ice_coeff_sw"] = f.get("coeff_sw")
        if f.exists("coeff_gen"):
            out["ice_coeff_gen"] = f.get("coeff_gen")
    return out


# --- parameterizations (elementwise over (ncol, nlev, nband)) -------------

def liq_socrates(coeff, lwp, re):
    """SOCRATES Padé fits (radiation_liquid_optics_socrates.F90:9-31).
    coeff (nband, 16); lwp/re (ncol, nlev). Returns od, scat_od, g."""
    c = [jnp.asarray(coeff[:, i]) for i in range(16)]
    re = jnp.clip(re, 1.2e-6, 50.0e-6)[..., None]
    lwp = lwp[..., None]
    od = lwp * (c[0] + re * (c[1] + re * c[2])) \
        / (1.0 + re * (c[3] + re * (c[4] + re * c[5])))
    scat_od = od * (1.0 - (c[6] + re * (c[7] + re * c[8]))
                    / (1.0 + re * (c[9] + re * c[10])))
    g = (c[11] + re * (c[12] + re * c[13])) \
        / (1.0 + re * (c[14] + re * c[15]))
    return od, scat_od, g


def ice_fu_sw(coeff, iwp, re):
    """Fu (1996) SW (radiation_ice_optics_fu.F90:10-33)."""
    c = [jnp.asarray(coeff[:, i]) for i in range(10)]
    max_g = 1.0 - 10.0 * np.finfo(np.float64).eps
    de_um = (jnp.minimum(re, 100.0e-6) * (1.0e6 / 0.64952))[..., None]
    inv_de = 1.0 / de_um
    iwp_g = (iwp * 1000.0)[..., None]
    od = iwp_g * (c[0] + c[1] * inv_de)
    scat_od = od * (1.0 - (c[2] + de_um * (c[3] + de_um * (c[4]
                                                          + de_um * c[5]))))
    g = jnp.minimum(c[6] + de_um * (c[7] + de_um * (c[8] + de_um * c[9])),
                    max_g)
    return od, scat_od, g


def ice_fu_lw(coeff, iwp, re):
    """Fu et al. (1998) LW (radiation_ice_optics_fu.F90:35-60)."""
    c = [jnp.asarray(coeff[:, i]) for i in range(11)]
    max_g = 1.0 - 10.0 * np.finfo(np.float64).eps
    de_um = (jnp.minimum(re, 100.0e-6) * (1.0e6 / 0.64952))[..., None]
    inv_de = 1.0 / de_um
    iwp_g = (iwp * 1000.0)[..., None]
    od = iwp_g * (c[0] + inv_de * (c[1] + inv_de * c[2]))
    scat_od = od - iwp_g * inv_de * (c[3] + de_um * (c[4] + de_um * (
        c[5] + de_um * c[6])))
    g = jnp.minimum(c[7] + de_um * (c[8] + de_um * (c[9] + de_um * c[10])),
                    max_g)
    return od, scat_od, g


def delta_eddington_scat_od(od, scat_od, g):
    """radiation_delta_eddington.h delta_eddington_scat_od."""
    f = g * g
    od = od - scat_od * f
    scat_od = scat_od * (1.0 - f)
    g = g / (1.0 + g)
    return od, scat_od, g


def cloud_optics(config: Config, tables: Dict, pressure_hl, temperature_hl,
                 cloud_fraction, q_liq, q_ice, re_liq, re_ice):
    """Cloud od/ssa/g per band (radiation_cloud_optics.F90:218-525).

    Returns dict with od_lw, ssa_lw, g_lw (ncol, nlev, nband_lw) and
    od_sw, ssa_sw, g_sw (ncol, nlev, nband_sw). In-cloud quantities.
    """
    in_cloud = cloud_fraction > 0.0
    if config.is_homogeneous:
        factor = (pressure_hl[:, 1:] - pressure_hl[:, :-1]) \
            / ACCEL_GRAVITY
    else:
        factor = (pressure_hl[:, 1:] - pressure_hl[:, :-1]) \
            / (ACCEL_GRAVITY * jnp.maximum(cloud_fraction, 1.0e-30))
    factor = jnp.where(in_cloud, factor, 0.0)
    lwp = factor * q_liq
    iwp = factor * q_ice

    if config.liquid_model == LiquidModel.SOCRATES:
        od_lw_liq, scat_lw_liq, g_lw_liq = liq_socrates(
            tables["liq_coeff_lw"], lwp, re_liq)
        od_sw_liq, scat_sw_liq, g_sw_liq = liq_socrates(
            tables["liq_coeff_sw"], lwp, re_liq)
    else:
        raise NotImplementedError(
            f"liquid model {config.liquid_model} not yet implemented")
    liq_present = (lwp > 0.0)[..., None]
    od_lw_liq = jnp.where(liq_present, od_lw_liq, 0.0)
    scat_lw_liq = jnp.where(liq_present, scat_lw_liq, 0.0)
    g_lw_liq = jnp.where(liq_present, g_lw_liq, 0.0)
    od_sw_liq = jnp.where(liq_present, od_sw_liq, 0.0)
    scat_sw_liq = jnp.where(liq_present, scat_sw_liq, 0.0)
    g_sw_liq = jnp.where(liq_present, g_sw_liq, 0.0)
    if not config.do_sw_delta_scaling_with_gases:
        od_sw_liq, scat_sw_liq, g_sw_liq = delta_eddington_scat_od(
            od_sw_liq, scat_sw_liq, g_sw_liq)

    if config.ice_model == IceModel.FU:
        od_lw_ice, scat_lw_ice, g_lw_ice = ice_fu_lw(
            tables["ice_coeff_lw"], iwp, re_ice)
        if config.do_fu_lw_ice_optics_bug:
            scat_lw_ice = od_lw_ice - scat_lw_ice
        od_sw_ice, scat_sw_ice, g_sw_ice = ice_fu_sw(
            tables["ice_coeff_sw"], iwp, re_ice)
    else:
        raise NotImplementedError(
            f"ice model {config.ice_model} not yet implemented")
    ice_present = (iwp > 0.0)[..., None]
    od_lw_ice = jnp.where(ice_present, od_lw_ice, 0.0)
    scat_lw_ice = jnp.where(ice_present, scat_lw_ice, 0.0)
    g_lw_ice = jnp.where(ice_present, g_lw_ice, 0.0)
    od_sw_ice = jnp.where(ice_present, od_sw_ice, 0.0)
    scat_sw_ice = jnp.where(ice_present, scat_sw_ice, 0.0)
    g_sw_ice = jnp.where(ice_present, g_sw_ice, 0.0)
    if not config.do_sw_delta_scaling_with_gases:
        od_sw_ice, scat_sw_ice, g_sw_ice = delta_eddington_scat_od(
            od_sw_ice, scat_sw_ice, g_sw_ice)
    od_lw_ice, scat_lw_ice, g_lw_ice = delta_eddington_scat_od(
        od_lw_ice, scat_lw_ice, g_lw_ice)

    in_cloud_b = in_cloud[..., None]
    out = {}
    if config.do_lw_cloud_scattering:
        od_lw = od_lw_liq + od_lw_ice
        scat_lw = scat_lw_liq + scat_lw_ice
        g_lw = jnp.where(scat_lw > 0.0,
                         (g_lw_liq * scat_lw_liq + g_lw_ice * scat_lw_ice)
                         / jnp.maximum(scat_lw, 1.0e-300), 0.0)
        ssa_lw = jnp.where(od_lw > 0.0,
                           scat_lw / jnp.maximum(od_lw, 1.0e-300), 0.0)
        out["od_lw"] = jnp.where(in_cloud_b, od_lw, 0.0)
        out["ssa_lw"] = jnp.where(in_cloud_b, ssa_lw, 0.0)
        out["g_lw"] = jnp.where(in_cloud_b, g_lw, 0.0)
    else:
        od_lw = (od_lw_liq - scat_lw_liq) + (od_lw_ice - scat_lw_ice)
        out["od_lw"] = jnp.where(in_cloud_b, od_lw, 0.0)
        out["ssa_lw"] = jnp.zeros_like(od_lw)
        out["g_lw"] = jnp.zeros_like(od_lw)

    od_sw = od_sw_liq + od_sw_ice
    scat_sw = scat_sw_liq + scat_sw_ice
    g_sw = jnp.where(scat_sw > 0.0,
                     (g_sw_liq * scat_sw_liq + g_sw_ice * scat_sw_ice)
                     / jnp.maximum(scat_sw, 1.0e-300), 0.0)
    ssa_sw = jnp.where(od_sw > 0.0,
                       scat_sw / jnp.maximum(od_sw, 1.0e-300), 0.0)
    out["od_sw"] = jnp.where(in_cloud_b, od_sw, 0.0)
    out["ssa_sw"] = jnp.where(in_cloud_b, ssa_sw, 0.0)
    out["g_sw"] = jnp.where(in_cloud_b, g_sw, 0.0)
    return out
