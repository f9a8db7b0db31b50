"""Aerosol optical properties.

Reference: radiation/radiation_aerosol_optics.F90 — general aerosol optics
setup (high-spectral-resolution file averaged to bands at setup, L96-215)
and the run-time RH-dependent merge into the gas optics arrays
(add_aerosol_optics L487-780); spectral averaging weights from
radiation_spectral_definition.F90:222-321 (calc_mapping).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ecrad_tpu.config import Config
from ecrad_tpu.optics.rrtmg_interp import take_bands
from ecrad_tpu.constants import ACCEL_GRAVITY
from ecrad_tpu.optics import spectral


def calc_mapping_bands(wavenumber1_band, wavenumber2_band, ref_temp,
                       wavenumber):
    """Planck-weighted mapping (nband, nwn) from high-res wavenumber grid
    to bands (radiation_spectral_definition.F90:248-321, use_bands=True)."""
    wavenumber = np.asarray(wavenumber, np.float64)
    nwn = wavenumber.size
    nband = len(wavenumber1_band)
    planck = spectral.planck_function_wavenumber(wavenumber, ref_temp)
    mapping = np.zeros((nband, nwn))
    for jb in range(nband):
        w1b, w2b = wavenumber1_band[jb], wavenumber2_band[jb]
        weight = np.zeros(nwn)
        for jw in range(nwn):
            if w1b <= wavenumber[jw] <= w2b:
                wn1 = w1b if jw == 0 else max(
                    w1b, 0.5 * (wavenumber[jw - 1] + wavenumber[jw]))
                wn2 = w2b if jw == nwn - 1 else min(
                    w2b, 0.5 * (wavenumber[jw] + wavenumber[jw + 1]))
                weight[jw] = (wn2 - wn1) * planck[jw]
        if weight.sum() <= 0.0:
            # band contains no sample points: interpolate/nearest
            if wavenumber[0] >= w2b:
                weight[0] = 1.0
            elif wavenumber[-1] <= w1b:
                weight[-1] = 1.0
            else:
                iwav = 1
                while wavenumber[iwav] < w2b:
                    iwav += 1
                mid = 0.5 * (w1b + w2b)
                weight[iwav - 1] = planck[iwav - 1] * (wavenumber[iwav]
                                                      - mid)
                weight[iwav] = planck[iwav] * (mid - wavenumber[iwav - 1])
        mapping[jb] = weight / weight.sum()
    return mapping


def setup_aerosol_optics(config: Config, data_dir: str,
                         wn1_sw, wn2_sw, wn1_lw, wn2_lw,
                         specdef_sw=None, specdef_lw=None) -> Dict:
    """Load + spectrally average the aerosol optics file (host-side).

    Implements the general (high-resolution) path
    (radiation_aerosol_optics.F90:96-215): per-band averaging with the
    RRTMG band structure, or per-g-point averaging through the spectral
    definition when do_cloud_aerosol_per_*_g_point (ecCKD path) —
    pass specdef_sw/lw for the latter.
    """
    from ecrad_tpu.io.netcdf import NcFile

    from ecrad_tpu.data import find_data_file

    if config.aerosol_optics_override_file_name:
        path = find_data_file(data_dir,
                              config.aerosol_optics_override_file_name)
    elif config.use_general_aerosol_optics:
        path = find_data_file(data_dir, "aerosol_ifs_49R1_20230119.nc")
    else:
        path = find_data_file(data_dir,
                              "aerosol_ifs_rrtm_46R1_with_NI_AM.nc")

    out = {}
    with NcFile(path) as f:
        if not f.exists("wavenumber"):
            # Legacy band-wise file: optical properties are already on
            # the gas-optics band grid (radiation_aerosol_optics.F90:59-62
            # -> radiation_aerosol_optics_data.F90:204-231 `setup`).  The
            # reference only checks band *counts* match
            # (radiation_aerosol_optics.F90:68-78); band bounds are taken
            # on faith.
            return _load_legacy_aerosol_optics(
                f, path, len(wn1_sw), len(wn1_lw),
                specdef_sw=(specdef_sw
                            if config.do_cloud_aerosol_per_sw_g_point
                            else None),
                specdef_lw=(specdef_lw
                            if config.do_cloud_aerosol_per_lw_g_point
                            else None))
        wavenumber = f.get("wavenumber")
        mass_ext_phobic = f.get("mass_ext_hydrophobic")     # (ntype, nwn)
        ssa_phobic = f.get("ssa_hydrophobic")
        g_phobic = f.get("asymmetry_hydrophobic")
        use_philic = f.exists("mass_ext_hydrophilic")
        if use_philic:
            mass_ext_philic = f.get("mass_ext_hydrophilic")  # (nt,nrh,nwn)
            ssa_philic = f.get("ssa_hydrophilic")
            g_philic = f.get("asymmetry_hydrophilic")
            rh_lower = f.get("relative_humidity1")

    if config.do_cloud_aerosol_per_sw_g_point and specdef_sw is not None:
        map_sw = specdef_sw.calc_mapping(wavenumber, use_bands=False)
    else:
        map_sw = calc_mapping_bands(wn1_sw, wn2_sw,
                                    spectral.SOLAR_REFERENCE_TEMPERATURE,
                                    wavenumber)
    if config.do_cloud_aerosol_per_lw_g_point and specdef_lw is not None:
        map_lw = specdef_lw.calc_mapping(wavenumber, use_bands=False)
    else:
        map_lw = calc_mapping_bands(
            wn1_lw, wn2_lw, spectral.TERRESTRIAL_REFERENCE_TEMPERATURE,
            wavenumber)

    def average(mapping, mass_ext, ssa, g):
        """Fortran: matmul(mapping(nband,nwn), X(nwn, ...)) — here the
        numpy arrays are C-ordered (..., nwn), so contract the last axis
        via einsum. Output (nband, ...)."""
        me = np.einsum("bw,...w->b...", mapping, mass_ext)
        ms = np.einsum("bw,...w->b...", mapping, mass_ext * ssa)
        mg = np.einsum("bw,...w->b...", mapping, mass_ext * ssa * g)
        ssa_b = ms / me
        g_b = mg / (me * ssa_b)
        return me, ssa_b, g_b

    out["mass_ext_sw_phobic"], out["ssa_sw_phobic"], out["g_sw_phobic"] = \
        average(map_sw, mass_ext_phobic, ssa_phobic, g_phobic)
    out["mass_ext_lw_phobic"], out["ssa_lw_phobic"], out["g_lw_phobic"] = \
        average(map_lw, mass_ext_phobic, ssa_phobic, g_phobic)
    out["use_hydrophilic"] = use_philic
    if use_philic:
        (out["mass_ext_sw_philic"], out["ssa_sw_philic"],
         out["g_sw_philic"]) = average(map_sw, mass_ext_philic,
                                       ssa_philic, g_philic)
        (out["mass_ext_lw_philic"], out["ssa_lw_philic"],
         out["g_lw_philic"]) = average(map_lw, mass_ext_philic,
                                       ssa_philic, g_philic)
        out["rh_lower"] = rh_lower
    # band-wise tables have shape (nband, ntype) or (nband, ntype, nrh)
    # (philic stored as (nband, ntype, nrh) here — note the reference is
    # (nband, nrh, ntype); we index accordingly at run time)
    return out


def _load_legacy_aerosol_optics(f, path, nb_sw, nb_lw,
                                specdef_sw=None, specdef_lw=None) -> Dict:
    """Band-wise aerosol optics file (e.g. aerosol_ifs_rrtm_46R1*.nc).

    Two uses in the reference:
      * RRTMG bands: tables used directly
        (radiation_aerosol_optics_data.F90:204-231 ``setup``; band-count
        check radiation_aerosol_optics.F90:68-78);
      * ecCKD per-g-point: band data spread onto g-points with
        calc_mapping_from_wavenumber_bands
        (setup_general_aerosol_optics_legacy,
        radiation_aerosol_optics.F90:345-476).
    """
    me_sw_phob = f.get("mass_ext_sw_hydrophobic")    # (ntype, nband)
    ssa_sw_phob = f.get("ssa_sw_hydrophobic")
    g_sw_phob = f.get("asymmetry_sw_hydrophobic")
    me_lw_phob = f.get("mass_ext_lw_hydrophobic")
    ssa_lw_phob = f.get("ssa_lw_hydrophobic")
    g_lw_phob = f.get("asymmetry_lw_hydrophobic")
    use_philic = f.exists("mass_ext_sw_hydrophilic")
    if use_philic:
        me_sw_phil = f.get("mass_ext_sw_hydrophilic")  # (nt, nrh, nband)
        ssa_sw_phil = f.get("ssa_sw_hydrophilic")
        g_sw_phil = f.get("asymmetry_sw_hydrophilic")
        me_lw_phil = f.get("mass_ext_lw_hydrophilic")
        ssa_lw_phil = f.get("ssa_lw_hydrophilic")
        g_lw_phil = f.get("asymmetry_lw_hydrophilic")
        rh_lower = f.get("relative_humidity1")
    wn1_sw_file = f.get("wavenumber1_sw")
    wn2_sw_file = f.get("wavenumber2_sw")
    wn1_lw_file = f.get("wavenumber1_lw")
    wn2_lw_file = f.get("wavenumber2_lw")

    def remap(mapping, me, ssa, g):
        """mapping (n_target, n_src); me/ssa/g (..., n_src).
        Extinction-weighted averages as radiation_aerosol_optics.F90:
        406-476."""
        me_t = np.einsum("ts,...s->...t", mapping, me)
        ssa_t = np.einsum("ts,...s->...t", mapping, me * ssa) \
            / np.maximum(me_t, 1e-300)
        g_t = np.einsum("ts,...s->...t", mapping, me * ssa * g) \
            / np.maximum(me_t * ssa_t, 1e-300)
        return me_t, ssa_t, g_t

    if specdef_sw is not None:
        map_sw = specdef_sw.calc_mapping_from_wavenumber_bands(
            wn1_sw_file, wn2_sw_file, use_bands=False).T
        me_sw_phob, ssa_sw_phob, g_sw_phob = remap(
            map_sw, me_sw_phob, ssa_sw_phob, g_sw_phob)
        if use_philic:
            me_sw_phil, ssa_sw_phil, g_sw_phil = remap(
                map_sw, me_sw_phil, ssa_sw_phil, g_sw_phil)
    elif me_sw_phob.shape[-1] != nb_sw:
        raise ValueError(
            "number of shortwave bands (%d) does not match aerosol "
            "optics look-up table (%d): %s"
            % (nb_sw, me_sw_phob.shape[-1], path))
    if specdef_lw is not None:
        map_lw = specdef_lw.calc_mapping_from_wavenumber_bands(
            wn1_lw_file, wn2_lw_file, use_bands=False).T
        me_lw_phob, ssa_lw_phob, g_lw_phob = remap(
            map_lw, me_lw_phob, ssa_lw_phob, g_lw_phob)
        if use_philic:
            me_lw_phil, ssa_lw_phil, g_lw_phil = remap(
                map_lw, me_lw_phil, ssa_lw_phil, g_lw_phil)
    elif me_lw_phob.shape[-1] != nb_lw:
        raise ValueError(
            "number of longwave bands (%d) does not match aerosol "
            "optics look-up table (%d): %s"
            % (nb_lw, me_lw_phob.shape[-1], path))

    out = {
        # phobic tables → (nband, ntype)
        "mass_ext_sw_phobic": np.ascontiguousarray(me_sw_phob.T),
        "ssa_sw_phobic": np.ascontiguousarray(ssa_sw_phob.T),
        "g_sw_phobic": np.ascontiguousarray(g_sw_phob.T),
        "mass_ext_lw_phobic": np.ascontiguousarray(me_lw_phob.T),
        "ssa_lw_phobic": np.ascontiguousarray(ssa_lw_phob.T),
        "g_lw_phobic": np.ascontiguousarray(g_lw_phob.T),
        "use_hydrophilic": use_philic,
    }
    if use_philic:
        # philic tables (ntype, nrh, nband) → (nband, ntype, nrh)
        tr = lambda a: np.ascontiguousarray(np.transpose(a, (2, 0, 1)))
        out.update(
            mass_ext_sw_philic=tr(me_sw_phil),
            ssa_sw_philic=tr(ssa_sw_phil),
            g_sw_philic=tr(g_sw_phil),
            mass_ext_lw_philic=tr(me_lw_phil),
            ssa_lw_philic=tr(ssa_lw_phil),
            g_lw_philic=tr(g_lw_phil),
            rh_lower=rh_lower,
        )
    return out


def h2o_sat_liq(pressure_fl, temperature_fl):
    """Saturation MMR wrt liquid (radiation_thermodynamics.F90:145-153)."""
    e_sat = 6.11e2 * jnp.exp(17.269 * (temperature_fl - 273.16)
                             / (temperature_fl - 35.86))
    return jnp.minimum(1.0, 0.622 * e_sat / pressure_fl)


def calc_rh_index(rh, rh_lower):
    """radiation_aerosol_optics_data.F90:640-664 → 0-based bin index."""
    rh_lower = jnp.asarray(rh_lower)
    # index of last bin whose lower bound is below rh (0-based)
    idx = jnp.sum(rh[..., None] > rh_lower[1:], axis=-1)
    return jnp.clip(idx, 0, rh_lower.shape[0] - 1)


def aerosol_band_properties(config: Config, tables: Dict, pressure_hl,
                            aerosol_mmr, rh):
    """Per-band aerosol od / scat_od / scat_od*g
    (radiation_aerosol_optics.F90:560-660).

    aerosol_mmr: (ncol, nlev, ntype); rh: (ncol, nlev).
    Returns dict od_sw/scat_sw/scatg_sw (ncol,nlev,nband_sw) + lw same.
    """
    factor = (pressure_hl[:, 1:] - pressure_hl[:, :-1]) / ACCEL_GRAVITY

    nb_sw = tables["mass_ext_sw_phobic"].shape[0]
    nb_lw = tables["mass_ext_lw_phobic"].shape[0]
    nprop = 3 * (nb_sw + nb_lw)

    # The whole per-band aerosol accumulation is ONE contraction:
    #   out[n, p] = sum_slots mr_slot[n] * T_slot(rh_bin[n])[p]
    # with p running over (od|scat|scatg) x (sw bands|lw bands).  Each
    # phobic slot contributes one row of the (K, nprop) table; each
    # hydrophilic slot contributes nrh rows selected by the one-hot RH
    # bin (radiation_aerosol_optics.F90:560-660 restructured: the type
    # loop and RH lookup fold into the matmul instead of materializing
    # per-(property,type) RH-interpolated fields — the previous
    # formulation built a ~1.3 GB (ncol,nlev,1170) intermediate).
    def prop_row(me, ss, gg):
        return np.concatenate([me, me * ss, me * ss * gg])

    rows = []            # table rows, each (nprop,)
    weights = []         # per-row weight builders, evaluated lazily
    mr_slots = []
    onehot_rh = None
    if tables["use_hydrophilic"]:
        irh = calc_rh_index(rh, tables["rh_lower"])
        nrh = np.asarray(tables["rh_lower"]).shape[0]
        onehot_rh = (irh[..., None]
                     == jnp.arange(nrh)).astype(factor.dtype)

    for jtype, mapping in enumerate(config.i_aerosol_type_map):
        if jtype >= aerosol_mmr.shape[-1] or mapping == 0:
            continue
        mr = factor * aerosol_mmr[:, :, jtype]      # (ncol, nlev)
        if mapping > 0:
            itype = mapping - 1
            rows.append(np.concatenate([
                prop_row(
                    np.asarray(tables["mass_ext_sw_phobic"][:, itype]),
                    np.asarray(tables["ssa_sw_phobic"][:, itype]),
                    np.asarray(tables["g_sw_phobic"][:, itype])),
                prop_row(
                    np.asarray(tables["mass_ext_lw_phobic"][:, itype]),
                    np.asarray(tables["ssa_lw_phobic"][:, itype]),
                    np.asarray(tables["g_lw_phobic"][:, itype]))]))
            weights.append(("phobic", len(mr_slots)))
        else:
            itype = -mapping - 1
            for r in range(nrh):
                rows.append(np.concatenate([
                    prop_row(
                        np.asarray(
                            tables["mass_ext_sw_philic"][:, itype, r]),
                        np.asarray(tables["ssa_sw_philic"][:, itype, r]),
                        np.asarray(tables["g_sw_philic"][:, itype, r])),
                    prop_row(
                        np.asarray(
                            tables["mass_ext_lw_philic"][:, itype, r]),
                        np.asarray(tables["ssa_lw_philic"][:, itype, r]),
                        np.asarray(tables["g_lw_philic"][:, itype, r]))]))
                weights.append(("philic", len(mr_slots), r))
        mr_slots.append(mr)

    if not rows:
        zsw = jnp.zeros(factor.shape + (nb_sw,), factor.dtype)
        zlw = jnp.zeros(factor.shape + (nb_lw,), factor.dtype)
        return dict(od_sw=zsw, scat_sw=zsw, scatg_sw=zsw,
                    od_lw=zlw, scat_lw=zlw, scatg_lw=zlw)

    table = np.stack(rows)                          # (K, 3(nbsw+nblw))
    wcols = []
    for w in weights:
        mr = mr_slots[w[1]]
        if w[0] == "phobic":
            wcols.append(mr[..., None])
        else:
            wcols.append((mr * onehot_rh[..., w[2]])[..., None])
    W = jnp.concatenate(wcols, axis=-1)             # (ncol, nlev, K)
    out = jnp.dot(W.reshape(-1, W.shape[-1]),
                  jnp.asarray(table, factor.dtype),
                  preferred_element_type=factor.dtype,
                  precision=jax.lax.Precision.HIGH)
    out = out.reshape(factor.shape + (nprop,))

    s = np.cumsum([0, nb_sw, nb_sw, nb_sw, nb_lw, nb_lw, nb_lw])
    return dict(od_sw=out[..., s[0]:s[1]], scat_sw=out[..., s[1]:s[2]],
                scatg_sw=out[..., s[2]:s[3]],
                od_lw=out[..., s[3]:s[4]], scat_lw=out[..., s[4]:s[5]],
                scatg_lw=out[..., s[5]:s[6]])


def delta_eddington_extensive(od, scat, scatg):
    """radiation_delta_eddington.h:46-69."""
    g = jnp.where(scat > 0.0, scatg / jnp.maximum(scat, 1e-300), 0.0)
    f = g * g
    od = od - scat * f
    scat = scat * (1.0 - f)
    scatg = scat * g / (1.0 + g)
    return od, scat, scatg


def add_aerosol_optics(config: Config, aer: Dict, band_from_g_sw,
                       band_from_g_lw, od_sw, ssa_sw, g_sw, od_lw,
                       ssa_lw=None, g_lw=None, layout="cln"):
    """Merge band-wise aerosol properties into per-g gas arrays
    (radiation_aerosol_optics.F90:662-780, RRTMG band-based branch).

    layout="knl": the gas arrays and the ``aer`` band profiles arrive in
    kernel layout ((nlev, ng|nband, ncol)); the merge itself is
    elementwise and layout-free, only the band→g expansion changes.

    Returns updated (od_sw, ssa_sw, g_sw, od_lw, ssa_lw, g_lw)."""
    bsw = jnp.asarray(band_from_g_sw)
    blw = jnp.asarray(band_from_g_lw)

    od_a, scat_a, scatg_a = aer["od_sw"], aer["scat_sw"], aer["scatg_sw"]
    if not config.do_sw_delta_scaling_with_gases:
        od_a, scat_a, scatg_a = delta_eddington_extensive(
            od_a, scat_a, scatg_a)
    od_a_g = take_bands(od_a, bsw, layout)
    scat_a_g = take_bands(scat_a, bsw, layout)
    scatg_a_g = take_bands(scatg_a, bsw, layout)
    if config.do_cloud_aerosol_per_sw_g_point:
        # per-g-point merge (radiation_aerosol_optics.F90:668-676)
        local_scat = ssa_sw * od_sw + scat_a_g
        od_sw = od_sw + od_a_g
        g_sw = scatg_a_g / jnp.maximum(local_scat, 1.0e-24)
        ssa_sw = jnp.minimum(local_scat / jnp.maximum(od_sw, 1.0e-24),
                             1.0)
    else:
        local_od = od_sw + od_a_g
        apply = (local_od > 0.0) & (od_a_g > 0.0)
        local_scat = ssa_sw * od_sw + scat_a_g
        new_g = jnp.where(local_scat > 0.0,
                          scatg_a_g / jnp.maximum(local_scat, 1e-300),
                          g_sw)
        g_sw = jnp.where(apply, new_g, g_sw)
        ssa_sw = jnp.where(apply, local_scat
                           / jnp.maximum(local_od, 1e-300), ssa_sw)
        od_sw = jnp.where(apply, local_od, od_sw)

    if config.do_lw_aerosol_scattering:
        od_a, scat_a, scatg_a = delta_eddington_extensive(
            aer["od_lw"], aer["scat_lw"], aer["scatg_lw"])
        od_a_g = take_bands(od_a, blw, layout)
        scat_a_g = take_bands(scat_a, blw, layout)
        scatg_a_g = take_bands(scatg_a, blw, layout)
        local_od = od_lw + od_a_g
        apply = (local_od > 0.0) & (od_a_g > 0.0)
        new_g = jnp.where(scat_a_g > 0.0,
                          scatg_a_g / jnp.maximum(scat_a_g, 1e-300), g_lw)
        g_lw = jnp.where(apply, new_g, g_lw)
        ssa_lw = jnp.where(apply, scat_a_g
                           / jnp.maximum(local_od, 1e-300), ssa_lw)
        od_lw = jnp.where(apply, local_od, od_lw)
    else:
        # absorption-only LW aerosol (radiation_aerosol_optics.F90:751-768)
        od_abs = aer["od_lw"] - aer["scat_lw"]
        od_lw = od_lw + take_bands(od_abs, blw, layout)

    return od_sw, ssa_sw, g_sw, od_lw, ssa_lw, g_lw
