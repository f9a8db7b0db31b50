"""TPU-native McICA cloud generator (counter-based RNG, fully on device).

Statistically equivalent to the reference generator but reproducible under
any sharding: random fields come from JAX's counter-based threefry PRNG
keyed per column, and the sampling algorithm follows the reference's
"vectorizable" formulation (radiation_cloud_generator.F90:587-720
generate_columns_exp_ran), which draws a fixed pattern of random numbers
and is a per-level `lax.scan` here.

For bit-exact golden-file validation against the reference, use the
host-side port in cloud_generator_exact.py instead; both produce the same
(od_scaling, total_cloud_cover) contract consumed by the McICA solvers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ecrad_tpu.config import Config, Overlap
from ecrad_tpu import profiling

MAX_CLOUD_FRAC = 1.0 - 2.0e-6


def cum_cloud_cover_exp_ran_jnp(frac, overlap_param, max_ran=False):
    """Vectorized overlap cumulator (radiation_cloud_cover.F90:124-229).

    frac (ncol, nlev); overlap_param (ncol, nlev-1).
    Returns (cum_cloud_cover (ncol, nlev), pair_cloud_cover (ncol, nlev-1)).
    """
    if max_ran:
        pair = jnp.maximum(frac[:, :-1], frac[:, 1:])
    else:
        a = overlap_param
        pair = (a * jnp.maximum(frac[:, :-1], frac[:, 1:])
                + (1.0 - a) * (frac[:, :-1] + frac[:, 1:]
                               - frac[:, :-1] * frac[:, 1:]))

    def step(cum_product, x):
        frac_lev, pair_lev = x
        cum_product = jnp.where(
            frac_lev >= MAX_CLOUD_FRAC, 0.0,
            cum_product * (1.0 - pair_lev)
            / jnp.maximum(1.0 - frac_lev, 1.0e-12))
        return cum_product, 1.0 - cum_product

    xs = (jnp.moveaxis(frac[:, :-1], 1, 0), jnp.moveaxis(pair, 1, 0))
    _, cum_levels = jax.lax.scan(step, 1.0 - frac[:, 0], xs)
    cum = jnp.concatenate([frac[:, :1], jnp.moveaxis(cum_levels, 0, 1)],
                          axis=1)
    return cum, pair


def sample_pdf_jnp(pdf_tables, fsd, cdf):
    """Bilinear PDF LUT lookup (radiation_pdf_sampler.F90:59-105)."""
    val = jnp.asarray(pdf_tables["val"])             # (ncdf, nfsd)
    fsd_axis = pdf_tables["fsd"]
    ncdf, nfsd = val.shape
    fsd1 = float(fsd_axis[0])
    inv_int = 1.0 / float(fsd_axis[1] - fsd_axis[0])

    wcdf = cdf * (ncdf - 1) + 1.0
    icdf = jnp.clip(wcdf.astype(jnp.int32), 1, ncdf - 1)
    wcdf = jnp.clip(wcdf - icdf, 0.0, 1.0)
    wfsd = (fsd - fsd1) * inv_int + 1.0
    ifsd = jnp.clip(wfsd.astype(jnp.int32), 1, nfsd - 1)
    wfsd = jnp.clip(wfsd - ifsd, 0.0, 1.0)
    flat = val.reshape(-1)

    def at(ic, ifs):
        return flat[jnp.clip(ic - 1, 0, ncdf - 1) * nfsd
                    + jnp.clip(ifs - 1, 0, nfsd - 1)]

    return ((1 - wcdf) * (1 - wfsd) * at(icdf, ifsd)
            + (1 - wcdf) * wfsd * at(icdf, ifsd + 1)
            + wcdf * (1 - wfsd) * at(icdf + 1, ifsd)
            + wcdf * wfsd * at(icdf + 1, ifsd + 1))


@profiling.traced("radiation_cloud_generator:cloud_generator")
def cloud_generator_device(config: Config, pdf_tables, iseed, frac,
                           overlap_param, fractional_std, ng: int):
    """On-device stochastic cloud sample.

    Args:
      iseed: (ncol,) int — per-column RNG key seeds.
      frac: (ncol, nlev) cloud fraction (cropped).
      overlap_param: (ncol, nlev-1).
      fractional_std: (ncol, nlev).
    Returns (od_scaling (ncol, nlev, ng), total_cloud_cover (ncol,)).
    """
    ncol, nlev = frac.shape
    max_ran = config.overlap_scheme == Overlap.MAXIMUM_RANDOM
    cum, pair = cum_cloud_cover_exp_ran_jnp(frac, overlap_param,
                                            max_ran=max_ran)
    total_cloud_cover = cum[:, -1]
    overhang = cum[:, 1:] - cum[:, :-1]

    decorr = config.cloud_inhom_decorr_scaling
    op_inhom = jnp.where(overlap_param > 0.0,
                         jnp.maximum(overlap_param, 1e-30)
                         ** (1.0 / decorr),
                         overlap_param)

    # Counter-based random fields, keyed per column
    keys = jax.vmap(lambda s: jax.random.key(s))(
        jnp.asarray(iseed, jnp.uint32))

    def draw(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        trig = jax.random.uniform(k1, (ng,), frac.dtype)
        rc = jax.random.uniform(k2, (nlev, ng), frac.dtype)
        ri = jax.random.uniform(k3, (nlev, ng), frac.dtype)
        ri2 = jax.random.uniform(k4, (nlev, ng), frac.dtype)
        return trig, rc, ri, ri2

    trigger, rand_cloud, rand_inhom, rand_inhom2 = jax.vmap(draw)(keys)
    trigger = trigger * total_cloud_cover[:, None]      # (ncol, ng)

    is_any_cloud = frac >= config.cloud_fraction_threshold

    # prepend a dummy level-(-1) for the jlev-1 accesses
    frac_m1 = jnp.concatenate([jnp.zeros_like(frac[:, :1]),
                               frac[:, :-1]], axis=1)
    cum_m1 = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]],
                             axis=1)
    pair_m1 = jnp.concatenate([jnp.zeros_like(pair[:, :1]), pair],
                              axis=1)           # pair at jlev-1
    over_m1 = jnp.concatenate([jnp.zeros_like(overhang[:, :1]),
                               overhang], axis=1)
    op_m1 = jnp.concatenate([jnp.zeros_like(op_inhom[:, :1]), op_inhom],
                            axis=1)

    lev = lambda a: jnp.moveaxis(a, 1, 0)

    def scan_step(carry, x):
        found_cloud, is_cloud, ri_prev = carry
        any_c, f, f_m1, c, c_m1, p_m1, o_m1, opi_m1, rc, ri, ri2 = x
        prev_cloud = is_cloud
        first_cloud = (trigger <= c[:, None]) & (~found_cloud)
        found_cloud = found_cloud | first_cloud
        cond_prev = rc * f_m1[:, None] < (
            f + f_m1 - p_m1)[:, None]
        cond_new = rc * (c_m1 - f_m1)[:, None] < (
            p_m1 - o_m1 - f_m1)[:, None]
        is_cloud = first_cloud | (found_cloud
                                  & jnp.where(prev_cloud, cond_prev,
                                              cond_new))
        is_cloud = is_cloud & any_c[:, None]
        ri_new = jnp.where((ri2 < opi_m1[:, None]) & prev_cloud,
                           ri_prev, ri)
        ri_new = jnp.where(is_cloud, ri_new, 0.0)
        ri_new = jnp.where(any_c[:, None], ri_new, 0.0)
        return (found_cloud, is_cloud, ri_new), ri_new

    init = (jnp.zeros((ncol, ng), bool), jnp.zeros((ncol, ng), bool),
            jnp.zeros((ncol, ng), frac.dtype))
    xs = (lev(is_any_cloud), lev(frac), lev(frac_m1), lev(cum),
          lev(cum_m1), lev(pair_m1), lev(over_m1), lev(op_m1),
          lev(rand_cloud), lev(rand_inhom), lev(rand_inhom2))
    _, ri_levels = jax.lax.scan(scan_step, init, xs)
    cdf = jnp.moveaxis(ri_levels, 0, 1)                 # (ncol, nlev, ng)

    od_scaling = jnp.where(
        cdf > 0.0,
        sample_pdf_jnp(pdf_tables, fractional_std[..., None], cdf), 0.0)
    od_scaling = jnp.where(is_any_cloud[..., None], od_scaling, 0.0)

    tcc = jnp.where(total_cloud_cover
                    >= config.cloud_fraction_threshold,
                    total_cloud_cover, 0.0)
    od_scaling = jnp.where(tcc[:, None, None] > 0.0, od_scaling, 0.0)
    return od_scaling, tcc
