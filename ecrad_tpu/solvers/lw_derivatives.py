"""Hogan & Bozzo (2015) longwave derivatives
(reference: radiation_lw_derivatives.F90).

d(flux_up at each half level)/d(flux_up at surface), used by host models
for approximate radiation updates between full radiation calls.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lw_derivatives_ica(transmittance, flux_up_surf):
    """ICA form (radiation_lw_derivatives.F90:43-83).

    Args:
      transmittance: (ncol, nlev, ng)
      flux_up_surf: (ncol, ng) upwelling surface flux per g-point
    Returns lw_derivatives (ncol, nlev+1), surface value 1.
    """
    deriv_g0 = flux_up_surf / jnp.sum(flux_up_surf, axis=-1,
                                      keepdims=True)
    lev = lambda a: jnp.moveaxis(a, -2, 0)

    def up_step(deriv_g, trans):
        deriv_g = deriv_g * trans
        return deriv_g, jnp.sum(deriv_g, axis=-1)

    _, deriv_levels = jax.lax.scan(up_step, deriv_g0,
                                   lev(transmittance), reverse=True)
    # deriv_levels[j] = derivative at half-level j (0..nlev-1, top-down)
    ones = jnp.ones(flux_up_surf.shape[:1])
    return jnp.concatenate(
        [jnp.moveaxis(deriv_levels, 0, -1), ones[:, None]], axis=-1)
