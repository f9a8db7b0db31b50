"""Pallas kernel for the McICA cloud-generator level scan.

The generator's per-level recurrence (solvers/cloud_generator.py
scan_step; reference radiation_cloud_generator.F90:587-720
generate_columns_exp_ran) is a tiny select chain on (ncol, ng) planes —
as `lax.scan` it is while-loop-overhead-bound (~6 ms/step at ncol=2048).
Here it is one kernel per overlap variant: random planes stream in
(generated OUTSIDE with the same per-column threefry keys, so the
sample and its sharding invariance are bit-identical to the scan path),
the (found_cloud, is_cloud, ri_prev) carries live in VMEM, and the CDF
plane streams out.

Layout: (nlev, ng, ncolp) with columns on lanes; the 8 per-level
per-column scalars are packed into one (nlev, 8, ncolp) array.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _col_block(ncolp):
    # largest power-of-two block that divides ncolp (grid coverage)
    for cb in (2048, 1024, 512, 256, 128):
        if ncolp % cb == 0:
            return min(cb, ncolp)
    return ncolp


# packed scalar row indices
_ANY, _F, _FM1, _C, _CM1, _PM1, _OM1, _OPIM1 = range(8)


def _gen_kernel(exp_exp, rc_ref, ri_ref, ri2_ref, sc_ref, trig_ref,
                cdf_ref, found, is_cloud, ri_prev):
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        found[:] = jnp.zeros_like(found)
        is_cloud[:] = jnp.zeros_like(is_cloud)
        ri_prev[:] = jnp.zeros_like(ri_prev)

    sc = sc_ref[0]                                   # (8, cb)
    any_c = sc[_ANY:_ANY + 1]                        # (1, cb)
    f = sc[_F:_F + 1]
    f_m1 = sc[_FM1:_FM1 + 1]
    c = sc[_C:_C + 1]
    c_m1 = sc[_CM1:_CM1 + 1]
    p_m1 = sc[_PM1:_PM1 + 1]
    o_m1 = sc[_OM1:_OM1 + 1]
    opi_m1 = sc[_OPIM1:_OPIM1 + 1]
    rc = rc_ref[0]
    ri = ri_ref[0]
    ri2 = ri2_ref[0]

    # All masks kept as f32 0/1 (Mosaic has no vector-i1 select chain);
    # a|b -> max, a&b -> mul, ~a -> 1-a on {0,1} values — identical
    # algebra to the lax.scan path's boolean form.
    one = jnp.ones_like(rc)
    zero = jnp.zeros_like(rc)
    prev = is_cloud[:]                               # f32 0/1
    foundf = found[:]
    first = jnp.where(trig_ref[:] <= c, one, zero) * (1.0 - foundf)
    foundf = jnp.maximum(foundf, first)
    cp = jnp.where(rc * f_m1 < (f + f_m1 - p_m1), one, zero)
    cn = jnp.where(rc * (c_m1 - f_m1) < (p_m1 - o_m1 - f_m1), one, zero)
    cond = prev * cp + (1.0 - prev) * cn
    isc = jnp.maximum(first, foundf * cond) \
        * jnp.where(any_c != 0.0, one, zero)

    keep = jnp.where(ri2 < opi_m1, one, zero)
    if exp_exp:
        # inhomogeneity chain runs across clear gaps
        # (radiation_cloud_generator.F90:497-509)
        chain = keep * ri_prev[:] + (1.0 - keep) * ri
        emit = isc * chain
        ri_prev[:] = chain
    else:
        keepp = keep * prev
        ri_new = isc * (keepp * ri_prev[:] + (1.0 - keepp) * ri)
        emit = ri_new
        ri_prev[:] = ri_new

    found[:] = foundf
    is_cloud[:] = isc
    cdf_ref[0] = emit


def generator_scan(rc, ri, ri2, scalars, trigger, exp_exp):
    """rc/ri/ri2 (nlev, ng, ncolp); scalars (nlev, 8, ncolp);
    trigger (ng, ncolp).  Returns cdf (nlev, ng, ncolp)."""
    nlev, ng, ncolp = rc.shape
    cb = _col_block(ncolp)
    dt = rc.dtype
    grid = (ncolp // cb, nlev)

    lev = pl.BlockSpec((1, ng, cb), lambda i, l: (l, 0, i))
    lev_s = pl.BlockSpec((1, 8, cb), lambda i, l: (l, 0, i))
    col = pl.BlockSpec((ng, cb), lambda i, l: (0, i))

    return pl.pallas_call(
        functools.partial(_gen_kernel, exp_exp),
        grid=grid,
        in_specs=[lev, lev, lev, lev_s, col],
        out_specs=lev,
        out_shape=jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt)],
    )(rc, ri, ri2, scalars, trigger)
