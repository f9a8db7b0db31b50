"""Clear-sky-only solvers (reference: radiation_cloudless_lw.F90:24-181,
radiation_cloudless_sw.F90:27-247).

Batched over columns; vertical recurrences live in ecrad_tpu.solvers.adding
(lax.scan).  Night columns are masked to zero fluxes at the end (the
reference skips them in its column loop)."""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp

from ecrad_tpu.solvers import adding, two_stream
from ecrad_tpu.solvers.lw_derivatives import lw_derivatives_ica
from ecrad_tpu import profiling


class LwSolverOutput(NamedTuple):
    flux_up: jnp.ndarray           # (ncol, nlev+1) broadband
    flux_dn: jnp.ndarray
    flux_up_g: jnp.ndarray         # (ncol, nlev+1, ng) spectral profile
    flux_dn_g: jnp.ndarray
    lw_derivatives: Optional[jnp.ndarray] = None


class SwSolverOutput(NamedTuple):
    flux_up: jnp.ndarray
    flux_dn_diffuse: jnp.ndarray
    flux_dn_direct: jnp.ndarray
    flux_up_g: jnp.ndarray
    flux_dn_diffuse_g: jnp.ndarray
    flux_dn_direct_g: jnp.ndarray


@profiling.traced("radiation_cloudless_lw:solver_cloudless_lw")
def solver_cloudless_lw(od, ssa, g, planck_hl, emission, albedo,
                        do_lw_aerosol_scattering=False,
                        do_lw_derivatives=False) -> LwSolverOutput:
    """Args: od/ssa/g (ncol,nlev,ng); planck_hl (ncol,nlev+1,ng);
    emission/albedo (ncol,ng)."""
    planck_top = planck_hl[:, :-1]
    planck_bot = planck_hl[:, 1:]
    if do_lw_aerosol_scattering:
        refl, trans, src_up, src_dn = two_stream.lw_ref_trans(
            od, ssa, g, planck_top, planck_bot)
        flux_up_g, flux_dn_g = adding.adding_lw(
            refl, trans, src_up, src_dn, emission, albedo)
    else:
        trans, src_up, src_dn = two_stream.lw_no_scattering_trans(
            od, planck_top, planck_bot)
        flux_up_g, flux_dn_g = adding.lw_no_scattering(
            trans, src_up, src_dn, emission, albedo)
    out = LwSolverOutput(
        flux_up=jnp.sum(flux_up_g, axis=-1),
        flux_dn=jnp.sum(flux_dn_g, axis=-1),
        flux_up_g=flux_up_g, flux_dn_g=flux_dn_g)
    if do_lw_derivatives:
        out = out._replace(lw_derivatives=lw_derivatives_ica(
            trans, flux_up_g[:, -1, :]))
    return out


@profiling.traced("radiation_cloudless_sw:solver_cloudless_sw")
def solver_cloudless_sw(od, ssa, g, incoming_sw, cos_sza,
                        albedo_diffuse, albedo_direct,
                        do_sw_delta_scaling_with_gases=False
                        ) -> SwSolverOutput:
    """Args: od/ssa/g (ncol,nlev,ng); incoming_sw (ncol,ng);
    cos_sza (ncol,); albedos (ncol,ng)."""
    mu0 = cos_sza[:, None, None]
    if do_sw_delta_scaling_with_gases:
        od, ssa, g = two_stream.delta_eddington(od, ssa, g)
    mu0_safe = jnp.maximum(mu0, 1.0e-10)
    refl, trans, ref_dir, trans_dir_diff, trans_dir_dir = \
        two_stream.sw_ref_trans(mu0_safe, od, ssa, g)
    fup_g, fdn_diff_g, fdn_dir_g = adding.adding_sw(
        incoming_sw, albedo_diffuse, albedo_direct,
        jnp.maximum(cos_sza[:, None], 1.0e-10),
        refl, trans, ref_dir, trans_dir_diff, trans_dir_dir)
    # Night columns: zero (radiation_cloudless_sw.F90:120-160)
    day = (cos_sza > 0.0)[:, None, None]
    fup_g = jnp.where(day, fup_g, 0.0)
    fdn_diff_g = jnp.where(day, fdn_diff_g, 0.0)
    fdn_dir_g = jnp.where(day, fdn_dir_g, 0.0)
    return SwSolverOutput(
        flux_up=jnp.sum(fup_g, axis=-1),
        flux_dn_diffuse=jnp.sum(fdn_diff_g, axis=-1),
        flux_dn_direct=jnp.sum(fdn_dir_g, axis=-1),
        flux_up_g=fup_g, flux_dn_diffuse_g=fdn_diff_g,
        flux_dn_direct_g=fdn_dir_g)
