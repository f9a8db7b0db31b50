"""McICA (Monte Carlo Independent Column Approximation) solvers.

Reference: radiation_mcica_lw.F90:39-285, radiation_mcica_sw.F90:41-410.

The stochastic cloud sample (``od_scaling`` per g-point/layer and
``total_cloud_cover``) is an *input* here: it is produced either by the
bit-exact host generator (solvers/cloud_generator_exact.py, used for
golden-file validation) or the TPU-native counter-based generator
(solvers/cloud_generator.py).  Everything else is batched JAX identical in
structure to the cloudless solver, with clear/cloudy layer properties
merged by masks rather than the reference's per-column branches.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ecrad_tpu.solvers import adding, two_stream
from ecrad_tpu.solvers.lw_derivatives import lw_derivatives_ica
from ecrad_tpu import profiling


class McicaLwOutput(NamedTuple):
    flux_up: jnp.ndarray
    flux_dn: jnp.ndarray
    flux_up_clear: jnp.ndarray
    flux_dn_clear: jnp.ndarray
    lw_dn_surf_g: jnp.ndarray
    lw_up_toa_g: jnp.ndarray
    lw_dn_surf_clear_g: jnp.ndarray
    lw_up_toa_clear_g: jnp.ndarray
    cloud_cover: jnp.ndarray
    lw_derivatives: Optional[jnp.ndarray] = None
    flux_up_g: Optional[jnp.ndarray] = None
    flux_dn_g: Optional[jnp.ndarray] = None
    flux_up_clear_g: Optional[jnp.ndarray] = None
    flux_dn_clear_g: Optional[jnp.ndarray] = None


class McicaSwOutput(NamedTuple):
    flux_up: jnp.ndarray
    flux_dn: jnp.ndarray
    flux_dn_direct: jnp.ndarray
    flux_up_clear: jnp.ndarray
    flux_dn_clear: jnp.ndarray
    flux_dn_direct_clear: jnp.ndarray
    sw_dn_diffuse_surf_g: jnp.ndarray
    sw_dn_direct_surf_g: jnp.ndarray
    sw_up_toa_g: jnp.ndarray
    sw_dn_diffuse_surf_clear_g: jnp.ndarray
    sw_dn_direct_surf_clear_g: jnp.ndarray
    sw_up_toa_clear_g: jnp.ndarray
    cloud_cover: jnp.ndarray
    flux_up_g: Optional[jnp.ndarray] = None
    flux_dn_g: Optional[jnp.ndarray] = None            # diffuse+direct
    flux_dn_direct_g: Optional[jnp.ndarray] = None
    flux_up_clear_g: Optional[jnp.ndarray] = None
    flux_dn_clear_g: Optional[jnp.ndarray] = None
    flux_dn_direct_clear_g: Optional[jnp.ndarray] = None


def _merge_cloud_lw(od_clear, od_cloud_g, cloudy_mask,
                    ssa_cloud_g=None, g_cloud_g=None,
                    ssa_clear=None, g_clear=None,
                    do_cloud_scattering=True,
                    do_aerosol_scattering=False):
    """Merge gas(+aerosol) and cloud optical properties per g-point
    (radiation_mcica_lw.F90:133-171)."""
    m = cloudy_mask[..., None]
    od_total = od_clear + jnp.where(m, od_cloud_g, 0.0)
    if not do_cloud_scattering:
        return od_total, None, None
    if do_aerosol_scattering:
        scat = ssa_clear * od_clear + jnp.where(
            m, ssa_cloud_g * od_cloud_g, 0.0)
        gscat = (g_clear * ssa_clear * od_clear
                 + jnp.where(m, g_cloud_g * ssa_cloud_g * od_cloud_g, 0.0))
    else:
        scat = jnp.where(m, ssa_cloud_g * od_cloud_g, 0.0)
        gscat = jnp.where(m, g_cloud_g * ssa_cloud_g * od_cloud_g, 0.0)
    ssa_total = jnp.where(od_total > 0.0,
                          scat / jnp.maximum(od_total, 1e-300), 0.0)
    g_total = jnp.where(scat > 0.0,
                        gscat / jnp.maximum(scat, 1e-300), 0.0)
    return od_total, ssa_total, g_total


@profiling.traced("radiation_mcica_lw:solver_mcica_lw")
def solver_mcica_lw(od, ssa, g, od_cloud_b, ssa_cloud_b, g_cloud_b,
                    band_from_g, od_scaling, total_cloud_cover,
                    cloud_fraction, planck_hl, emission, albedo,
                    cloud_fraction_threshold=1.0e-6,
                    do_lw_cloud_scattering=True,
                    do_lw_aerosol_scattering=False,
                    do_lw_derivatives=False) -> McicaLwOutput:
    """Args:
      od/ssa/g: clear-sky (gas+aerosol) (ncol, nlev, ng)
      od_cloud_b/...: in-cloud per band (ncol, nlev, nband)
      band_from_g: (ng,) 0-based
      od_scaling: (ncol, nlev, ng); total_cloud_cover (ncol,)
      cloud_fraction: (ncol, nlev)
    """
    planck_top, planck_bot = planck_hl[:, :-1], planck_hl[:, 1:]
    bb = jnp.asarray(band_from_g)

    # --- clear sky
    if do_lw_aerosol_scattering:
        ref_clear, trans_clear, src_up_clear, src_dn_clear = \
            two_stream.lw_ref_trans(od, ssa, g, planck_top, planck_bot)
        fup_clear_g, fdn_clear_g = adding.adding_lw(
            ref_clear, trans_clear, src_up_clear, src_dn_clear,
            emission, albedo)
    else:
        trans_clear, src_up_clear, src_dn_clear = \
            two_stream.lw_no_scattering_trans(od, planck_top, planck_bot)
        ref_clear = jnp.zeros_like(trans_clear)
        fup_clear_g, fdn_clear_g = adding.lw_no_scattering(
            trans_clear, src_up_clear, src_dn_clear, emission, albedo)

    # --- total sky
    cloudy_layer = cloud_fraction >= cloud_fraction_threshold
    od_cloud_g = od_scaling * jnp.take(od_cloud_b, bb, axis=-1)
    od_total, ssa_total, g_total = _merge_cloud_lw(
        od, od_cloud_g, cloudy_layer,
        ssa_cloud_g=jnp.take(ssa_cloud_b, bb, axis=-1)
        if ssa_cloud_b is not None else None,
        g_cloud_g=jnp.take(g_cloud_b, bb, axis=-1)
        if g_cloud_b is not None else None,
        ssa_clear=ssa, g_clear=g,
        do_cloud_scattering=do_lw_cloud_scattering,
        do_aerosol_scattering=do_lw_aerosol_scattering)

    if do_lw_cloud_scattering:
        refl_c, trans_c, src_up_c, src_dn_c = two_stream.lw_ref_trans(
            od_total, ssa_total, g_total, planck_top, planck_bot)
        mask = cloudy_layer[..., None]
        refl = jnp.where(mask, refl_c, ref_clear)
        trans = jnp.where(mask, trans_c, trans_clear)
        src_up = jnp.where(mask, src_up_c, src_up_clear)
        src_dn = jnp.where(mask, src_dn_c, src_dn_clear)
        fup_g, fdn_g = adding.adding_lw(refl, trans, src_up, src_dn,
                                        emission, albedo)
    else:
        trans_c, src_up_c, src_dn_c = \
            two_stream.lw_no_scattering_trans(od_total, planck_top,
                                              planck_bot)
        mask = cloudy_layer[..., None]
        trans = jnp.where(mask, trans_c, trans_clear)
        src_up = jnp.where(mask, src_up_c, src_up_clear)
        src_dn = jnp.where(mask, src_dn_c, src_dn_clear)
        fup_g, fdn_g = adding.lw_no_scattering(trans, src_up, src_dn,
                                               emission, albedo)

    # --- combine with cloud cover weights; profile with no cloud → clear
    tcc = total_cloud_cover
    has_cloud = (tcc >= cloud_fraction_threshold)
    w = jnp.where(has_cloud, tcc, 0.0)[:, None, None]
    fup_g_tot = w * fup_g + (1.0 - w) * fup_clear_g
    fdn_g_tot = w * fdn_g + (1.0 - w) * fdn_clear_g

    out = McicaLwOutput(
        flux_up=jnp.sum(fup_g_tot, axis=-1),
        flux_dn=jnp.sum(fdn_g_tot, axis=-1),
        flux_up_clear=jnp.sum(fup_clear_g, axis=-1),
        flux_dn_clear=jnp.sum(fdn_clear_g, axis=-1),
        lw_dn_surf_g=fdn_g_tot[:, -1, :],
        lw_up_toa_g=fup_g_tot[:, 0, :],
        lw_dn_surf_clear_g=fdn_clear_g[:, -1, :],
        lw_up_toa_clear_g=fup_clear_g[:, 0, :],
        cloud_cover=jnp.where(has_cloud, tcc, 0.0),
        flux_up_g=fup_g_tot, flux_dn_g=fdn_g_tot,
        flux_up_clear_g=fup_clear_g, flux_dn_clear_g=fdn_clear_g)

    if do_lw_derivatives:
        # cloudy-scene derivative, then blend with clear
        # (radiation_mcica_lw.F90:236-248; modify_lw_derivatives_ica)
        deriv_cloudy = lw_derivatives_ica(trans, fup_g[:, -1, :])
        deriv_clear = lw_derivatives_ica(trans_clear,
                                         fup_clear_g[:, -1, :])
        wd = jnp.where(has_cloud, 1.0 - tcc, 1.0)[:, None]
        deriv = jnp.where(
            has_cloud[:, None],
            (1.0 - wd) * deriv_cloudy + wd * deriv_clear,
            deriv_clear)
        # surface value is defined as exactly 1
        deriv = deriv.at[:, -1].set(1.0)
        out = out._replace(lw_derivatives=deriv)
    return out


@profiling.traced("radiation_mcica_sw:solver_mcica_sw")
def solver_mcica_sw(od, ssa, g, od_cloud_b, ssa_cloud_b, g_cloud_b,
                    band_from_g, od_scaling, total_cloud_cover,
                    cloud_fraction, incoming_sw, cos_sza,
                    albedo_diffuse, albedo_direct,
                    cloud_fraction_threshold=1.0e-6,
                    do_sw_delta_scaling_with_gases=False) -> McicaSwOutput:
    mu0 = jnp.maximum(cos_sza, 1.0e-10)[:, None, None]
    bb = jnp.asarray(band_from_g)

    # --- clear sky
    od_c, ssa_c, g_c = od, ssa, g
    if do_sw_delta_scaling_with_gases:
        od_c, ssa_c, g_c = two_stream.delta_eddington(od_c, ssa_c, g_c)
    r_cl, t_cl, rdir_cl, tdd_cl, tdir_cl = two_stream.sw_ref_trans(
        mu0, od_c, ssa_c, g_c)
    fup_clear_g, fdnd_clear_g, fdir_clear_g = adding.adding_sw(
        incoming_sw, albedo_diffuse, albedo_direct,
        jnp.maximum(cos_sza, 1.0e-10)[:, None],
        r_cl, t_cl, rdir_cl, tdd_cl, tdir_cl)

    # --- total sky: merge cloud into gas optics per g
    cloudy_layer = cloud_fraction >= cloud_fraction_threshold
    m = cloudy_layer[..., None]
    od_cloud_g = od_scaling * jnp.take(od_cloud_b, bb, axis=-1)
    od_tot = od + jnp.where(m, od_cloud_g, 0.0)
    scat = ssa * od + jnp.where(
        m, jnp.take(ssa_cloud_b, bb, axis=-1) * od_cloud_g, 0.0)
    gscat = (g * ssa * od
             + jnp.where(m, jnp.take(g_cloud_b, bb, axis=-1)
                         * jnp.take(ssa_cloud_b, bb, axis=-1)
                         * od_cloud_g, 0.0))
    ssa_tot = jnp.where(od_tot > 0.0, scat / jnp.maximum(od_tot, 1e-300),
                        0.0)
    g_tot = jnp.where(scat > 0.0, gscat / jnp.maximum(scat, 1e-300), 0.0)
    if do_sw_delta_scaling_with_gases:
        od_tot, ssa_tot, g_tot = two_stream.delta_eddington(
            od_tot, ssa_tot, g_tot)
    r_c, t_c, rdir_c, tdd_c, tdir_c = two_stream.sw_ref_trans(
        mu0, od_tot, ssa_tot, g_tot)
    refl = jnp.where(m, r_c, r_cl)
    trans = jnp.where(m, t_c, t_cl)
    rdir = jnp.where(m, rdir_c, rdir_cl)
    tdd = jnp.where(m, tdd_c, tdd_cl)
    tdir = jnp.where(m, tdir_c, tdir_cl)
    fup_g, fdnd_g, fdir_g = adding.adding_sw(
        incoming_sw, albedo_diffuse, albedo_direct,
        jnp.maximum(cos_sza, 1.0e-10)[:, None],
        refl, trans, rdir, tdd, tdir)

    tcc = total_cloud_cover
    has_cloud = tcc >= cloud_fraction_threshold
    day = cos_sza > 0.0
    w = jnp.where(has_cloud, tcc, 0.0)[:, None, None]
    zero_night = lambda x: jnp.where(day[:, None, None], x, 0.0)
    fup_g_tot = zero_night(w * fup_g + (1.0 - w) * fup_clear_g)
    fdnd_g_tot = zero_night(w * fdnd_g + (1.0 - w) * fdnd_clear_g)
    fdir_g_tot = zero_night(w * fdir_g + (1.0 - w) * fdir_clear_g)
    fup_clear_g = zero_night(fup_clear_g)
    fdnd_clear_g = zero_night(fdnd_clear_g)
    fdir_clear_g = zero_night(fdir_clear_g)

    return McicaSwOutput(
        flux_up=jnp.sum(fup_g_tot, axis=-1),
        flux_dn=jnp.sum(fdnd_g_tot + fdir_g_tot, axis=-1),
        flux_dn_direct=jnp.sum(fdir_g_tot, axis=-1),
        flux_up_clear=jnp.sum(fup_clear_g, axis=-1),
        flux_dn_clear=jnp.sum(fdnd_clear_g + fdir_clear_g, axis=-1),
        flux_dn_direct_clear=jnp.sum(fdir_clear_g, axis=-1),
        sw_dn_diffuse_surf_g=fdnd_g_tot[:, -1, :],
        sw_dn_direct_surf_g=fdir_g_tot[:, -1, :],
        sw_up_toa_g=fup_g_tot[:, 0, :],
        sw_dn_diffuse_surf_clear_g=fdnd_clear_g[:, -1, :],
        sw_dn_direct_surf_clear_g=fdir_clear_g[:, -1, :],
        sw_up_toa_clear_g=fup_clear_g[:, 0, :],
        # night columns keep the reference's unset sentinel -1
        # (radiation_flux.F90 reset; radiation_mcica_sw.F90 only assigns
        # for cos_sza > 0)
        cloud_cover=jnp.where(day, tcc, -1.0),
        flux_up_g=fup_g_tot,
        flux_dn_g=fdnd_g_tot + fdir_g_tot,
        flux_dn_direct_g=fdir_g_tot,
        flux_up_clear_g=fup_clear_g,
        flux_dn_clear_g=fdnd_clear_g + fdir_clear_g,
        flux_dn_direct_clear_g=fdir_clear_g)
