"""Adding method flux computations as lax.scan recurrences.

Reference: radiation_adding_ica_sw.F90:24-153 (adding_ica_sw),
radiation_adding_ica_lw.F90:32-334 (adding_ica_lw,
calc_fluxes_no_scattering_lw).

Level axis convention: index 0 = top of atmosphere. Arrays are
``(ncol, nlev, ng)``; per-column scalars broadcast ``(ncol, 1)``.
The scans carry ``(ncol, ng)`` states — the vertical recurrence is
inherently sequential (137 steps) while the (ncol, ng) plane fills the
TPU vector lanes at every step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def adding_sw(incoming_toa, albedo_surf_diffuse, albedo_surf_direct,
              cos_sza, reflectance, transmittance, ref_dir, trans_dir_diff,
              trans_dir_dir):
    """Shortwave adding (radiation_adding_ica_sw.F90:24-153).

    Args:
      incoming_toa: (ncol, ng) direct solar flux into beam cross-section.
      albedo_surf_diffuse/direct: (ncol, ng).
      cos_sza: (ncol, 1) or (ncol, ng).
      reflectance..trans_dir_dir: (ncol, nlev, ng) layer properties.

    Returns (flux_up, flux_dn_diffuse, flux_dn_direct), each
    (ncol, nlev+1, ng); direct flux is into a *horizontal* plane (i.e.
    multiplied by mu0, as in the reference output).
    """
    nlev = reflectance.shape[-2]

    # 1) Direct-beam cumulative transmission downward (cumprod scan)
    def dir_step(fd, t):
        fd_next = fd * t
        return fd_next, fd_next

    lev = lambda a: jnp.moveaxis(a, -2, 0)       # (nlev, ncol, ng)
    _, fdir_below = jax.lax.scan(dir_step, incoming_toa, lev(trans_dir_dir))
    # flux_dn_direct at half-levels: [incoming_toa, fdir_below...]
    flux_dn_direct = jnp.concatenate(
        [incoming_toa[None], fdir_below], axis=0)   # (nlev+1, ncol, ng)

    # 2) Upward sweep: accumulate albedo of atmosphere below half-level and
    #    the upwelling "source" from scattered direct radiation
    def up_step(carry, x):
        albedo_below, source_below = carry
        refl, trans, rdir, tdirdiff, fdir_top = x
        inv_denom = 1.0 / (1.0 - albedo_below * refl)
        albedo = refl + trans * trans * albedo_below * inv_denom
        source = rdir * fdir_top + trans * (
            source_below + albedo_below * tdirdiff * fdir_top) * inv_denom
        return (albedo, source), (albedo_below, source_below, inv_denom)

    albedo_surf_diffuse = jnp.broadcast_to(albedo_surf_diffuse,
                                           incoming_toa.shape)
    source_surf = albedo_surf_direct * flux_dn_direct[-1] * cos_sza
    xs = (lev(reflectance), lev(transmittance), lev(ref_dir),
          lev(trans_dir_diff), flux_dn_direct[:-1])
    (albedo_top, source_top), (albedo_below, source_below, inv_denom) = \
        jax.lax.scan(up_step, (albedo_surf_diffuse, source_surf), xs,
                     reverse=True)

    # 3) Downward sweep computing diffuse fluxes
    def dn_step(fdn, x):
        trans, refl, tdirdiff, fdir_top, src_below, alb_below, inv_d = x
        fdn_next = (trans * fdn + refl * src_below
                    + tdirdiff * fdir_top) * inv_d
        fup_next = alb_below * fdn_next + src_below
        return fdn_next, (fdn_next, fup_next)

    fdn_top = jnp.zeros_like(incoming_toa)
    xs2 = (lev(transmittance), lev(reflectance), lev(trans_dir_diff),
           flux_dn_direct[:-1], source_below, albedo_below, inv_denom)
    _, (fdn_levels, fup_levels) = jax.lax.scan(dn_step, fdn_top, xs2)

    flux_dn_diffuse = jnp.concatenate([fdn_top[None], fdn_levels], axis=0)
    flux_up = jnp.concatenate([source_top[None], fup_levels], axis=0)
    flux_dn_direct = flux_dn_direct * cos_sza  # into horizontal plane

    tolev = lambda a: jnp.moveaxis(a, 0, -2)     # back to (ncol, nlev+1, ng)
    return tolev(flux_up), tolev(flux_dn_diffuse), tolev(flux_dn_direct)


def adding_lw(reflectance, transmittance, source_up, source_dn,
              emission_surf, albedo_surf):
    """Longwave adding with scattering
    (radiation_adding_ica_lw.F90:32-134 adding_ica_lw).

    Args (ncol, nlev, ng) layer props; (ncol, ng) surface.
    Returns (flux_up, flux_dn), each (ncol, nlev+1, ng).
    """
    lev = lambda a: jnp.moveaxis(a, -2, 0)
    albedo_surf = jnp.broadcast_to(albedo_surf, emission_surf.shape)

    def up_step(carry, x):
        albedo_below, source_below = carry
        refl, trans, s_up, s_dn = x
        inv_denom = 1.0 / (1.0 - albedo_below * refl)
        albedo = refl + trans * trans * albedo_below * inv_denom
        source = s_up + trans * (source_below
                                 + albedo_below * s_dn) * inv_denom
        return (albedo, source), (albedo_below, source_below, inv_denom)

    xs = (lev(reflectance), lev(transmittance), lev(source_up),
          lev(source_dn))
    (albedo_top, source_top), (albedo_below, source_below, inv_denom) = \
        jax.lax.scan(up_step, (albedo_surf, emission_surf), xs, reverse=True)

    def dn_step(fdn, x):
        trans, refl, s_dn, src_below, alb_below, inv_d = x
        fdn_next = (trans * fdn + refl * src_below + s_dn) * inv_d
        fup_next = alb_below * fdn_next + src_below
        return fdn_next, (fdn_next, fup_next)

    fdn_top = jnp.zeros_like(emission_surf)
    xs2 = (lev(transmittance), lev(reflectance), lev(source_dn),
           source_below, albedo_below, inv_denom)
    _, (fdn_levels, fup_levels) = jax.lax.scan(dn_step, fdn_top, xs2)

    flux_dn = jnp.concatenate([fdn_top[None], fdn_levels], axis=0)
    flux_up = jnp.concatenate([source_top[None], fup_levels], axis=0)
    tolev = lambda a: jnp.moveaxis(a, 0, -2)
    return tolev(flux_up), tolev(flux_dn)


def lw_no_scattering(transmittance, source_up, source_dn, emission_surf,
                     albedo_surf):
    """LW fluxes with no scattering: simple down then up recurrences
    (radiation_adding_ica_lw.F90:272-334 calc_fluxes_no_scattering_lw)."""
    lev = lambda a: jnp.moveaxis(a, -2, 0)
    albedo_surf = jnp.broadcast_to(albedo_surf, emission_surf.shape)

    def dn_step(fdn, x):
        trans, s_dn = x
        fdn_next = trans * fdn + s_dn
        return fdn_next, fdn_next

    fdn_top = jnp.zeros_like(emission_surf)
    fdn_surf, fdn_levels = jax.lax.scan(
        dn_step, fdn_top, (lev(transmittance), lev(source_dn)))
    flux_dn = jnp.concatenate([fdn_top[None], fdn_levels], axis=0)

    fup_surf = emission_surf + albedo_surf * fdn_surf

    def up_step(fup, x):
        trans, s_up = x
        fup_next = trans * fup + s_up
        return fup_next, fup_next

    _, fup_levels = jax.lax.scan(
        up_step, fup_surf, (lev(transmittance), lev(source_up)),
        reverse=True)
    flux_up = jnp.concatenate([fup_levels, fup_surf[None]], axis=0)
    tolev = lambda a: jnp.moveaxis(a, 0, -2)
    return tolev(flux_up), tolev(flux_dn)
