"""Clear-sky-only solvers (reference: radiation_cloudless_lw.F90:24-181,
radiation_cloudless_sw.F90:27-247).

Batched over columns; vertical recurrences live in ecrad_tpu.solvers.adding
(lax.scan) and emit spectrally-reduced fluxes per level (outputs.py
contract).  Night columns are masked to zero fluxes at the end (the
reference skips them in its column loop)."""

from __future__ import annotations

import jax.numpy as jnp

from ecrad_tpu.solvers import adding, two_stream
from ecrad_tpu.solvers.lw_derivatives import lw_derivatives_ica
from ecrad_tpu.solvers.outputs import LwFluxes, SwFluxes
from ecrad_tpu import profiling


@profiling.traced("radiation_cloudless_lw:solver_cloudless_lw")
def solver_cloudless_lw(od, ssa, g, planck_hl, emission, albedo,
                        do_lw_aerosol_scattering=False,
                        do_lw_derivatives=False,
                        spec_matrix=None) -> LwFluxes:
    """Args: od/ssa/g (ncol,nlev,ng); planck_hl (ncol,nlev+1,ng);
    emission/albedo (ncol,ng)."""
    planck_top = planck_hl[:, :-1]
    planck_bot = planck_hl[:, 1:]
    if do_lw_aerosol_scattering:
        refl, trans, src_up, src_dn = two_stream.lw_ref_trans(
            od, ssa, g, planck_top, planck_bot)
        r = adding.adding_lw_reduced(refl, trans, src_up, src_dn,
                                     emission, albedo, spec_matrix)
    else:
        trans, src_up, src_dn = two_stream.lw_no_scattering_trans(
            od, planck_top, planck_bot)
        r = adding.lw_no_scattering_reduced(trans, src_up, src_dn,
                                            emission, albedo, spec_matrix)
    out = LwFluxes(
        flux_up=r.up, flux_dn=r.dn,
        flux_up_clear=r.up, flux_dn_clear=r.dn,
        lw_dn_surf_g=r.dn_surf_g, lw_up_toa_g=r.up_toa_g,
        lw_dn_surf_clear_g=r.dn_surf_g, lw_up_toa_clear_g=r.up_toa_g,
        cloud_cover=jnp.zeros(od.shape[0], od.dtype),
        flux_up_s=r.up_s, flux_dn_s=r.dn_s,
        flux_up_clear_s=r.up_s, flux_dn_clear_s=r.dn_s)
    if do_lw_derivatives:
        out = out._replace(lw_derivatives=lw_derivatives_ica(
            trans, r.up_surf_g))
    return out


@profiling.traced("radiation_cloudless_sw:solver_cloudless_sw")
def solver_cloudless_sw(od, ssa, g, incoming_sw, cos_sza,
                        albedo_diffuse, albedo_direct,
                        do_sw_delta_scaling_with_gases=False,
                        spec_matrix=None) -> SwFluxes:
    """Args: od/ssa/g (ncol,nlev,ng); incoming_sw (ncol,ng);
    cos_sza (ncol,); albedos (ncol,ng)."""
    mu0 = cos_sza[:, None, None]
    if do_sw_delta_scaling_with_gases:
        od, ssa, g = two_stream.delta_eddington(od, ssa, g)
    mu0_safe = jnp.maximum(mu0, 1.0e-10)
    refl, trans, ref_dir, trans_dir_diff, trans_dir_dir = \
        two_stream.sw_ref_trans(mu0_safe, od, ssa, g)
    r = adding.adding_sw_reduced(
        incoming_sw, albedo_diffuse, albedo_direct,
        jnp.maximum(cos_sza[:, None], 1.0e-10),
        refl, trans, ref_dir, trans_dir_diff, trans_dir_dir, spec_matrix)

    day = cos_sza > 0.0

    def zn(x):
        # Night columns: zero (radiation_cloudless_sw.F90:120-160)
        if x is None:
            return None
        d = day.reshape(day.shape + (1,) * (x.ndim - 1))
        return jnp.where(d, x, 0.0)

    dn = r.dn_diffuse + r.dn_direct
    dn_s = None if r.dn_diffuse_s is None else r.dn_diffuse_s + r.dn_direct_s
    return SwFluxes(
        flux_up=zn(r.up), flux_dn=zn(dn), flux_dn_direct=zn(r.dn_direct),
        flux_up_clear=zn(r.up), flux_dn_clear=zn(dn),
        flux_dn_direct_clear=zn(r.dn_direct),
        sw_dn_diffuse_surf_g=zn(r.dn_diffuse_surf_g),
        sw_dn_direct_surf_g=zn(r.dn_direct_surf_g),
        sw_up_toa_g=zn(r.up_toa_g),
        sw_dn_diffuse_surf_clear_g=zn(r.dn_diffuse_surf_g),
        sw_dn_direct_surf_clear_g=zn(r.dn_direct_surf_g),
        sw_up_toa_clear_g=zn(r.up_toa_g),
        cloud_cover=jnp.zeros_like(cos_sza),
        flux_up_s=zn(r.up_s), flux_dn_s=zn(dn_s),
        flux_dn_direct_s=zn(r.dn_direct_s),
        flux_up_clear_s=zn(r.up_s), flux_dn_clear_s=zn(dn_s),
        flux_dn_direct_clear_s=zn(r.dn_direct_s))
