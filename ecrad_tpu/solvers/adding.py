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

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class SwAdding(NamedTuple):
    """Reduced SW adding output: broadband profiles + boundary g slices
    (+ optional spectrally-projected profiles)."""
    up: jnp.ndarray                  # (ncol, nlev+1) broadband
    dn_diffuse: jnp.ndarray
    dn_direct: jnp.ndarray
    up_toa_g: jnp.ndarray            # (ncol, ng)
    dn_diffuse_surf_g: jnp.ndarray
    dn_direct_surf_g: jnp.ndarray
    up_s: Optional[jnp.ndarray] = None        # (ncol, nlev+1, nspec)
    dn_diffuse_s: Optional[jnp.ndarray] = None
    dn_direct_s: Optional[jnp.ndarray] = None


class LwAdding(NamedTuple):
    up: jnp.ndarray                  # (ncol, nlev+1) broadband
    dn: jnp.ndarray
    up_toa_g: jnp.ndarray            # (ncol, ng)
    dn_surf_g: jnp.ndarray
    up_surf_g: jnp.ndarray           # for LW derivatives
    up_s: Optional[jnp.ndarray] = None
    dn_s: Optional[jnp.ndarray] = None


def _project(y, spec_matrix):
    """Project a (ncol, ng) plane to broadband (and optionally bands)."""
    bb = jnp.sum(y, axis=-1)
    if spec_matrix is None:
        return bb, None
    return bb, y @ spec_matrix


def adding_sw_reduced(incoming_toa, albedo_surf_diffuse, albedo_surf_direct,
                      cos_sza, reflectance, transmittance, ref_dir,
                      trans_dir_diff, trans_dir_dir, spec_matrix=None
                      ) -> SwAdding:
    """SW adding with on-the-fly spectral reduction.

    Same recurrences as :func:`adding_sw` (radiation_adding_ica_sw.F90:
    24-153) but each scan step emits only the g-sum (and an optional
    ``(ng, nspec)`` projection, e.g. a one-hot band matrix) instead of the
    full per-g flux profile — the reference computes broadband sums on the
    fly for exactly this reason (radiation_mcica_sw.F90:185-222), and on
    TPU it removes ~(nlev+1)*ng/1-sized HBM temporaries per output.
    Boundary (surface/TOA) fluxes stay g-resolved for the spectral
    diagnostics.
    """
    lev = lambda a: jnp.moveaxis(a, -2, 0)       # (nlev, ncol, ng)

    # 1) Direct-beam cumulative transmission downward
    def dir_step(fd, t):
        fd_next = fd * t
        bb, sp = _project(fd_next, spec_matrix)
        return fd_next, (fd_next, bb, sp)

    fdir_surf, (fdir_below, fdir_bb, fdir_sp) = jax.lax.scan(
        dir_step, incoming_toa, lev(trans_dir_dir))
    fdir_top_levels = jnp.concatenate(
        [incoming_toa[None], fdir_below[:-1]], axis=0)  # (nlev, ncol, ng)

    # 2) Upward sweep: albedo of atmosphere below + upwelling source
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
    source_surf = albedo_surf_direct * fdir_surf * cos_sza
    xs = (lev(reflectance), lev(transmittance), lev(ref_dir),
          lev(trans_dir_diff), fdir_top_levels)
    (albedo_top, source_top), (albedo_below, source_below, inv_denom) = \
        jax.lax.scan(up_step, (albedo_surf_diffuse, source_surf), xs,
                     reverse=True)

    # 3) Downward sweep emitting reduced fluxes per level
    def dn_step(fdn, x):
        trans, refl, tdirdiff, fdir_top, src_below, alb_below, inv_d = x
        fdn_next = (trans * fdn + refl * src_below
                    + tdirdiff * fdir_top) * inv_d
        fup_next = alb_below * fdn_next + src_below
        dn_bb, dn_sp = _project(fdn_next, spec_matrix)
        up_bb, up_sp = _project(fup_next, spec_matrix)
        return fdn_next, (dn_bb, up_bb, dn_sp, up_sp)

    fdn_top = jnp.zeros_like(incoming_toa)
    xs2 = (lev(transmittance), lev(reflectance), lev(trans_dir_diff),
           fdir_top_levels, source_below, albedo_below, inv_denom)
    fdn_surf, (dn_bb, up_bb, dn_sp, up_sp) = jax.lax.scan(
        dn_step, fdn_top, xs2)

    mu0 = cos_sza                                    # (ncol, 1) or (ncol, ng)
    mu0_bb = mu0[..., 0] if mu0.ndim == 2 else mu0

    def stack_profiles(top, levels):
        """[top (ncol,...)] + levels (nlev, ncol, ...) → (ncol, nlev+1, ...)"""
        prof = jnp.concatenate([top[None], levels], axis=0)
        return jnp.moveaxis(prof, 0, 1)

    up_toa_bb, up_toa_sp = _project(source_top, spec_matrix)
    dir_toa_bb, dir_toa_sp = _project(incoming_toa, spec_matrix)
    zeros_bb = jnp.zeros_like(up_toa_bb)

    out = SwAdding(
        up=stack_profiles(up_toa_bb, up_bb),
        dn_diffuse=stack_profiles(zeros_bb, dn_bb),
        dn_direct=stack_profiles(dir_toa_bb, fdir_bb) * mu0_bb[:, None],
        up_toa_g=source_top,
        dn_diffuse_surf_g=fdn_surf,
        dn_direct_surf_g=fdir_surf * mu0,
    )
    if spec_matrix is not None:
        out = out._replace(
            up_s=stack_profiles(up_toa_sp, up_sp),
            dn_diffuse_s=stack_profiles(jnp.zeros_like(up_toa_sp), dn_sp),
            dn_direct_s=(stack_profiles(dir_toa_sp, fdir_sp)
                         * mu0_bb[:, None, None]))
    return out


def adding_lw_reduced(reflectance, transmittance, source_up, source_dn,
                      emission_surf, albedo_surf, spec_matrix=None
                      ) -> LwAdding:
    """LW adding (scattering) with on-the-fly spectral reduction
    (recurrences of radiation_adding_ica_lw.F90:32-134)."""
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
        dn_bb, dn_sp = _project(fdn_next, spec_matrix)
        up_bb, up_sp = _project(fup_next, spec_matrix)
        return fdn_next, (dn_bb, up_bb, dn_sp, up_sp)

    fdn_top = jnp.zeros_like(emission_surf)
    xs2 = (lev(transmittance), lev(reflectance), lev(source_dn),
           source_below, albedo_below, inv_denom)
    fdn_surf, (dn_bb, up_bb, dn_sp, up_sp) = jax.lax.scan(
        dn_step, fdn_top, xs2)
    fup_surf_g = albedo_surf * fdn_surf + emission_surf

    def stack_profiles(top, levels):
        prof = jnp.concatenate([top[None], levels], axis=0)
        return jnp.moveaxis(prof, 0, 1)

    up_toa_bb, up_toa_sp = _project(source_top, spec_matrix)
    out = LwAdding(
        up=stack_profiles(up_toa_bb, up_bb),
        dn=stack_profiles(jnp.zeros_like(up_toa_bb), dn_bb),
        up_toa_g=source_top, dn_surf_g=fdn_surf, up_surf_g=fup_surf_g)
    if spec_matrix is not None:
        out = out._replace(
            up_s=stack_profiles(up_toa_sp, up_sp),
            dn_s=stack_profiles(jnp.zeros_like(up_toa_sp), dn_sp))
    return out


def lw_no_scattering_reduced(transmittance, source_up, source_dn,
                             emission_surf, albedo_surf, spec_matrix=None
                             ) -> LwAdding:
    """No-scattering LW recurrences with on-the-fly spectral reduction
    (radiation_adding_ica_lw.F90:272-334)."""
    lev = lambda a: jnp.moveaxis(a, -2, 0)
    albedo_surf = jnp.broadcast_to(albedo_surf, emission_surf.shape)

    def dn_step(fdn, x):
        trans, s_dn = x
        fdn_next = trans * fdn + s_dn
        bb, sp = _project(fdn_next, spec_matrix)
        return fdn_next, (bb, sp)

    fdn_top = jnp.zeros_like(emission_surf)
    fdn_surf, (dn_bb, dn_sp) = jax.lax.scan(
        dn_step, fdn_top, (lev(transmittance), lev(source_dn)))

    fup_surf = emission_surf + albedo_surf * fdn_surf

    def up_step(fup, x):
        trans, s_up = x
        fup_next = trans * fup + s_up
        bb, sp = _project(fup_next, spec_matrix)
        return fup_next, (bb, sp)

    fup_toa_g, (up_bb, up_sp) = jax.lax.scan(
        up_step, fup_surf, (lev(transmittance), lev(source_up)),
        reverse=True)

    surf_up_bb, surf_up_sp = _project(fup_surf, spec_matrix)
    zeros_bb = jnp.zeros_like(surf_up_bb)

    def stack_up(levels, bottom):
        prof = jnp.concatenate([levels, bottom[None]], axis=0)
        return jnp.moveaxis(prof, 0, 1)

    def stack_dn(top, levels):
        prof = jnp.concatenate([top[None], levels], axis=0)
        return jnp.moveaxis(prof, 0, 1)

    out = LwAdding(
        up=stack_up(up_bb, surf_up_bb),
        dn=stack_dn(zeros_bb, dn_bb),
        up_toa_g=fup_toa_g, dn_surf_g=fdn_surf, up_surf_g=fup_surf)
    if spec_matrix is not None:
        out = out._replace(up_s=stack_up(up_sp, surf_up_sp),
                           dn_s=stack_dn(jnp.zeros_like(surf_up_sp), dn_sp))
    return out


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
