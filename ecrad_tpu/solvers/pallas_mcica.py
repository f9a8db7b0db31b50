"""Fully-fused Pallas McICA solvers: two-stream + cloud merge + adding
sweeps in single TPU kernels.

Reference decomposition: radiation_mcica_lw.F90:39-285 /
radiation_mcica_sw.F90:41-410 compute per-g-point layer optics
(radiation_two_stream.F90), merge cloud properties into the gas optics
for cloudy g-points, then run the adding sweeps
(radiation_adding_ica_{sw,lw}.F90).  The unfused JAX path (mcica.py +
pallas_adding.py) materializes every intermediate — reflectance,
transmittance, sources for clear and total sky — as (ncol, nlev, ng)
HBM arrays (~150 MB each at ncol=2048), making the solver
bandwidth-bound.  Here each vertical sweep is ONE kernel that reads the
*optical inputs* (gas od/ssa/g, per-band cloud properties, od scaling),
recomputes the layer coefficients on the fly per level in VMEM, and
carries the sweep state in scratch.  Layer coefficients are recomputed
once per sweep instead of stored — FLOPs (VPU) traded for HBM traffic,
the right trade on TPU.

Both scenes (clear + total sky) advance in the same kernel so the gas
optics are read once per sweep, and the reference's exact blend
semantics (total-sky properties equal clear-sky outside cloudy layers,
radiation_mcica_lw.F90:133-171) hold by construction via the in-kernel
mask select.

Numerics: the per-level math calls the SAME jnp functions as the
unfused path (solvers/two_stream.py, _merge formulas) — Pallas traces
them onto the VPU unchanged, so results match the pallas_adding path to
f32 roundoff.

Layout: kernel arrays are (nlev, ng, ncolp) / (nlev+1, ng, ncolp) with
columns on lanes, g on sublanes (see pallas_adding.py); per-band cloud
arrays are (nlev, nband, ncolp); per-column planes (ng, ncolp) or
(1, ncolp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecrad_tpu.solvers import two_stream


_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _col_block(ncolp):
    """Largest power-of-two column block <= 2048 that DIVIDES ncolp —
    the grid is (ncolp // cb, nlev), so a non-divisor cb would silently
    leave the tail columns unprocessed.  cb=2048 measured ~1% faster
    than 1024 at the flagship shapes; the sweeps' ref sets then need
    tens of MB of scoped VMEM, above the 16 MB default limit, so every
    pallas_call passes _VMEM_LIMIT (v5e has 128 MB)."""
    for cb in (2048, 1024, 512, 256, 128):
        if ncolp % cb == 0:
            return min(cb, ncolp)
    return ncolp


def band_expand_matrix(gcounts, dtype):
    """(ng, nband) 0/1 staircase matrix: bands own contiguous g ranges
    (RRTMG band-major ordering)."""
    nband = len(gcounts)
    reps = np.repeat(np.arange(nband), gcounts)
    return np.asarray(reps[:, None] == np.arange(nband), dtype)


def _expand_bands(x_b, exp_ref):
    """(nband, cb) per-band values -> (ng, cb) per-g rows via the 0/1
    one-hot matmul — rides the otherwise-idle MXU (HIGH precision: pure
    selection is exact in bf16-triple arithmetic) instead of a chain of
    sublane-misaligned copies.  exp_ref: (ng, nband) kernel input."""
    # HIGHEST: Mosaic's in-kernel dot supports DEFAULT/HIGHEST only;
    # the matrix is tiny so the extra passes are free, and 0/1
    # selection is exact in any pass scheme
    return jax.lax.dot_general(
        exp_ref[:], x_b,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=x_b.dtype,
        precision=jax.lax.Precision.HIGHEST)


def _merge_lw(od, odc_g, ssac_g, gc_g, mask):
    """Total-sky LW merge for cloudy layers
    (radiation_mcica_lw.F90:133-171, cloud scattering on, aerosol
    scattering off) — same expressions as mcica._merge_cloud_lw."""
    od_total = od + jnp.where(mask, odc_g, 0.0)
    scat = jnp.where(mask, ssac_g * odc_g, 0.0)
    gscat = jnp.where(mask, gc_g * ssac_g * odc_g, 0.0)
    ssa_total = jnp.where(od_total > 0.0,
                          scat / jnp.maximum(od_total, 1e-300), 0.0)
    g_total = jnp.where(scat > 0.0,
                        gscat / jnp.maximum(scat, 1e-300), 0.0)
    return od_total, ssa_total, g_total


def _merge_sw(od, ssa, g, odc_g, ssac_g, gc_g, mask):
    """Total-sky SW merge (radiation_mcica_sw.F90; mcica.solver_mcica_sw
    expressions)."""
    od_tot = od + jnp.where(mask, odc_g, 0.0)
    scat = ssa * od + jnp.where(mask, ssac_g * odc_g, 0.0)
    gscat = g * ssa * od + jnp.where(mask, gc_g * ssac_g * odc_g, 0.0)
    ssa_tot = jnp.where(od_tot > 0.0,
                        scat / jnp.maximum(od_tot, 1e-300), 0.0)
    g_tot = jnp.where(scat > 0.0, gscat / jnp.maximum(scat, 1e-300), 0.0)
    return od_tot, ssa_tot, g_tot


# ===========================================================================
# LW kernels
# ===========================================================================


def _lw_layer_total(od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                    exp_ref, mask_ref, ptop, pbot, gcounts):
    """Total-sky blended layer coefficients at the current level."""
    od = od_ref[0]
    trans_c, s_up_c, s_dn_c = two_stream.lw_no_scattering_trans(
        od, ptop, pbot)
    odc_g = odscal_ref[0] * _expand_bands(odcb_ref[0], exp_ref)
    ssac_g = _expand_bands(ssacb_ref[0], exp_ref)
    gc_g = _expand_bands(gcb_ref[0], exp_ref)
    mask = mask_ref[0] != 0.0                      # (1, cb) -> broadcast
    od_t, ssa_t, g_t = _merge_lw(od, odc_g, ssac_g, gc_g, mask)
    refl_m, trans_m, s_up_m, s_dn_m = two_stream.lw_ref_trans(
        od_t, ssa_t, g_t, ptop, pbot)
    zeros = jnp.zeros_like(refl_m)
    refl = jnp.where(mask, refl_m, zeros)
    trans = jnp.where(mask, trans_m, trans_c)
    s_up = jnp.where(mask, s_up_m, s_up_c)
    s_dn = jnp.where(mask, s_dn_m, s_dn_c)
    return (trans_c, s_up_c, s_dn_c), (refl, trans, s_up, s_dn)


def _lw_p1_kernel(od_ref, ptop_ref, pbot_ref,
                  dn_bb_ref, fdn_surf_ref, fdn, acc):
    """Clear-sky downward no-scattering sweep
    (radiation_adding_ica_lw.F90:272-334 downward half)."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdn[:] = jnp.zeros_like(fdn)

    trans_c, _, s_dn_c = two_stream.lw_no_scattering_trans(
        od_ref[0], ptop_ref[0], pbot_ref[0])
    fdn_new = trans_c * fdn[:] + s_dn_c
    fdn[:] = fdn_new
    acc[pl.ds(l, 1), :] = jnp.sum(fdn_new, axis=0, keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        fdn_surf_ref[:] = fdn_new
        dn_bb_ref[:] = acc[:]


def _lw_p2_kernel(gcounts, od_ref, odscal_ref, odcb_ref, ssacb_ref,
                  gcb_ref, exp_ref, mask_ref, ptop_ref, pbot_ref,
                  fup0_ref, alb0_ref, emis_ref,
                  alb_below_ref, src_below_ref, up_bb_ref, fup_toa_ref,
                  src_top_ref, fup_c, alb_t, src_t, acc):
    """Upward pass: clear no-scattering up-sweep + total-sky Möbius
    up-sweep (adding_ica_lw.F90:32-134) sharing one read of the gas
    optics.  Levels iterate surface -> TOA (reverse specs)."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fup_c[:] = fup0_ref[:]
        alb_t[:] = alb0_ref[:]
        src_t[:] = emis_ref[:]

    (trans_c, s_up_c, _), (refl, trans, s_up, s_dn) = _lw_layer_total(
        od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
        mask_ref, ptop_ref[0], pbot_ref[0], gcounts)

    # clear: affine up
    fup_new = trans_c * fup_c[:] + s_up_c
    fup_c[:] = fup_new
    acc[pl.ds(nlev - 1 - l, 1), :] = jnp.sum(fup_new, axis=0,
                                             keepdims=True)
    # total: Möbius up (carry = albedo/source of atmosphere below)
    albedo = alb_t[:]
    source = src_t[:]
    alb_below_ref[0] = albedo
    src_below_ref[0] = source
    inv = 1.0 / (1.0 - albedo * refl)
    alb_t[:] = refl + trans * trans * albedo * inv
    src_t[:] = s_up + trans * (source + albedo * s_dn) * inv

    @pl.when(l == nlev - 1)
    def _():
        fup_toa_ref[:] = fup_new
        up_bb_ref[:] = acc[:]
        src_top_ref[:] = src_t[:]


def _lw_p3_kernel(gcounts, od_ref, odscal_ref, odcb_ref, ssacb_ref,
                  gcb_ref, exp_ref, mask_ref, ptop_ref, pbot_ref,
                  alb_below_ref, src_below_ref,
                  dn_bb_ref, up_bb_ref, fdn_surf_ref,
                  fdn, dn_acc, up_acc):
    """Total-sky downward sweep (adding_ica_lw.F90 downward half),
    recomputing the blended layer coefficients."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdn[:] = jnp.zeros_like(fdn)

    _, (refl, trans, _, s_dn) = _lw_layer_total(
        od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
        mask_ref, ptop_ref[0], pbot_ref[0], gcounts)
    alb_below = alb_below_ref[0]
    src_below = src_below_ref[0]
    inv = 1.0 / (1.0 - alb_below * refl)
    fdn_new = (trans * fdn[:] + refl * src_below + s_dn) * inv
    fup_new = alb_below * fdn_new + src_below
    fdn[:] = fdn_new
    dn_acc[pl.ds(l, 1), :] = jnp.sum(fdn_new, axis=0, keepdims=True)
    up_acc[pl.ds(l, 1), :] = jnp.sum(fup_new, axis=0, keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        fdn_surf_ref[:] = fdn_new
        dn_bb_ref[:] = dn_acc[:]
        up_bb_ref[:] = up_acc[:]


def _lw_deriv_kernel(gcounts, od_ref, odscal_ref, odcb_ref, ssacb_ref,
                     gcb_ref, exp_ref, mask_ref, ptop_ref, pbot_ref,
                     d0c_ref, d0t_ref, deriv_c_ref, deriv_t_ref,
                     dc, dt_, acc_c, acc_t):
    """Hogan-Bozzo LW derivatives for clear and total sky in one upward
    pass (radiation_lw_derivatives.F90:43-83): carry multiplies the
    layer transmittance, broadband sum emitted per level."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        dc[:] = d0c_ref[:]
        dt_[:] = d0t_ref[:]

    (trans_c, _, _), (_, trans_t, _, _) = _lw_layer_total(
        od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
        mask_ref, ptop_ref[0], pbot_ref[0], gcounts)
    dc_new = dc[:] * trans_c
    dt_new = dt_[:] * trans_t
    dc[:] = dc_new
    dt_[:] = dt_new
    acc_c[pl.ds(nlev - 1 - l, 1), :] = jnp.sum(dc_new, axis=0,
                                               keepdims=True)
    acc_t[pl.ds(nlev - 1 - l, 1), :] = jnp.sum(dt_new, axis=0,
                                               keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        deriv_c_ref[:] = acc_c[:]
        deriv_t_ref[:] = acc_t[:]


def lw_fused(od, odc_b, ssac_b, gc_b, od_scaling, mask, planck_hl,
             emission, albedo, gcounts, do_derivatives):
    """Run the fused LW solver sweeps.

    Kernel-layout args: od/od_scaling (nlev, ng, ncolp); odc_b/ssac_b/
    gc_b (nlev, nband, ncolp); mask (nlev, 1, ncolp) 0/1 float;
    planck_hl (nlev+1, ng, ncolp); emission/albedo (ng, ncolp);
    gcounts static tuple of per-band g counts.

    Returns dict of clear/total reduced outputs (see wrappers)."""
    nlev, ng, ncolp = od.shape
    nband = odc_b.shape[1]
    cb = _col_block(ncolp)
    dt = od.dtype
    grid = (ncolp // cb, nlev)

    lev = pl.BlockSpec((1, ng, cb), lambda i, l: (l, 0, i))
    rev = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - 1 - l, 0, i))
    lev_b = pl.BlockSpec((1, nband, cb), lambda i, l: (l, 0, i))
    rev_b = pl.BlockSpec((1, nband, cb),
                         lambda i, l: (nlev - 1 - l, 0, i))
    lev_m = pl.BlockSpec((1, 1, cb), lambda i, l: (l, 0, i))
    rev_m = pl.BlockSpec((1, 1, cb), lambda i, l: (nlev - 1 - l, 0, i))
    # planck at layer top/bottom half-levels (top-down index l, l+1)
    ptop = pl.BlockSpec((1, ng, cb), lambda i, l: (l, 0, i))
    pbot = pl.BlockSpec((1, ng, cb), lambda i, l: (l + 1, 0, i))
    ptop_r = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - 1 - l, 0, i))
    pbot_r = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - l, 0, i))
    col = pl.BlockSpec((ng, cb), lambda i, l: (0, i))
    bb = pl.BlockSpec((nlev, cb), lambda i, l: (0, i))
    exp_spec = pl.BlockSpec((ng, nband), lambda i, l: (0, 0))
    expand = jnp.asarray(band_expand_matrix(gcounts, dt))

    # P1: clear-sky downward
    dn_bb_c, fdn_surf_c = pl.pallas_call(
                _lw_p1_kernel, grid=grid,
        in_specs=[lev, ptop, pbot],
        out_specs=(bb, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, planck_hl, planck_hl)

    fup_surf_c = emission + albedo * fdn_surf_c

    # P2: clear up + total Möbius up (reverse level order)
    p2 = pl.pallas_call(
                functools.partial(_lw_p2_kernel, gcounts), grid=grid,
        in_specs=[rev, rev, rev_b, rev_b, rev_b, exp_spec, rev_m,
                  ptop_r, pbot_r, col, col, col],
        out_specs=(rev, rev, bb, col, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, od_scaling, odc_b, ssac_b, gc_b, expand, mask, planck_hl,
      planck_hl, fup_surf_c, albedo, emission)
    alb_below, src_below, up_bb_c, fup_toa_c, src_top_t = p2

    # P3: total-sky downward
    dn_bb_t, up_bb_t, fdn_surf_t = pl.pallas_call(
                functools.partial(_lw_p3_kernel, gcounts), grid=grid,
        in_specs=[lev, lev, lev_b, lev_b, lev_b, exp_spec, lev_m,
                  ptop, pbot, lev, lev],
        out_specs=(bb, bb, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, od_scaling, odc_b, ssac_b, gc_b, expand, mask, planck_hl,
      planck_hl, alb_below, src_below)

    fup_surf_t = albedo * fdn_surf_t + emission
    out = dict(dn_bb_c=dn_bb_c, fdn_surf_c=fdn_surf_c,
               up_bb_c=up_bb_c, fup_toa_c=fup_toa_c,
               fup_surf_c=fup_surf_c,
               src_top_t=src_top_t, dn_bb_t=dn_bb_t, up_bb_t=up_bb_t,
               fdn_surf_t=fdn_surf_t, fup_surf_t=fup_surf_t)

    if do_derivatives:
        eps = jnp.asarray(1e-30, dt)
        d0c = fup_surf_c / jnp.maximum(
            jnp.sum(fup_surf_c, axis=0, keepdims=True), eps)
        d0t = fup_surf_t / jnp.maximum(
            jnp.sum(fup_surf_t, axis=0, keepdims=True), eps)
        deriv_c, deriv_t = pl.pallas_call(
                    functools.partial(_lw_deriv_kernel, gcounts), grid=grid,
            in_specs=[rev, rev, rev_b, rev_b, rev_b, exp_spec, rev_m,
                      ptop_r, pbot_r, col, col],
            out_specs=(bb, bb),
            out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                       jax.ShapeDtypeStruct((nlev, ncolp), dt)),
            compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                            pltpu.VMEM((ng, cb), dt),
                            pltpu.VMEM((nlev, cb), dt),
                            pltpu.VMEM((nlev, cb), dt)],
        )(od, od_scaling, odc_b, ssac_b, gc_b, expand, mask,
          planck_hl, planck_hl, d0c, d0t)
        out["deriv_c"] = deriv_c
        out["deriv_t"] = deriv_t
    return out


# ===========================================================================
# SW kernels
# ===========================================================================


def _sw_layers(gcounts, delta_gases, od_ref, ssa_ref, g_ref, odscal_ref,
               odcb_ref, ssacb_ref, gcb_ref, exp_ref, mask_ref, mu0_ref):
    """Clear and total-sky Meador-Weaver coefficients at one level."""
    od = od_ref[0]
    ssa = ssa_ref[0]
    g = g_ref[0]
    mu0 = mu0_ref[0]                                 # (1, cb)
    odc_g = odscal_ref[0] * _expand_bands(odcb_ref[0], exp_ref)
    ssac_g = _expand_bands(ssacb_ref[0], exp_ref)
    gc_g = _expand_bands(gcb_ref[0], exp_ref)
    mask = mask_ref[0] != 0.0
    od_t, ssa_t, g_t = _merge_sw(od, ssa, g, odc_g, ssac_g, gc_g, mask)
    if delta_gases:
        od, ssa, g = two_stream.delta_eddington(od, ssa, g)
        od_t, ssa_t, g_t = two_stream.delta_eddington(od_t, ssa_t, g_t)
    cl = two_stream.sw_ref_trans(mu0, od, ssa, g, pallas_safe=True)
    mg = two_stream.sw_ref_trans(mu0, od_t, ssa_t, g_t, pallas_safe=True)
    tot = tuple(jnp.where(mask, m, c) for m, c in zip(mg, cl))
    return cl, tot


def _sw_s1_kernel(gcounts, delta_gases, od_ref, ssa_ref, g_ref,
                  odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
                  mask_ref,
                  mu0_ref, inc_ref,
                  ftc_ref, ftt_ref, dir_bb_c_ref, dir_bb_t_ref,
                  fdir_surf_c_ref, fdir_surf_t_ref,
                  fdir_c, fdir_t, acc_c, acc_t):
    """Direct-beam downward sweep for both scenes; writes the
    above-layer direct flux planes consumed by S2/S3."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdir_c[:] = inc_ref[:]
        fdir_t[:] = inc_ref[:]

    cl, tot = _sw_layers(gcounts, delta_gases, od_ref, ssa_ref, g_ref,
                         odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                         exp_ref, mask_ref, mu0_ref)
    tdd_c = cl[4]
    tdd_t = tot[4]
    ftc_ref[0] = fdir_c[:]
    ftt_ref[0] = fdir_t[:]
    fc_new = tdd_c * fdir_c[:]
    ft_new = tdd_t * fdir_t[:]
    fdir_c[:] = fc_new
    fdir_t[:] = ft_new
    acc_c[pl.ds(l, 1), :] = jnp.sum(fc_new, axis=0, keepdims=True)
    acc_t[pl.ds(l, 1), :] = jnp.sum(ft_new, axis=0, keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        fdir_surf_c_ref[:] = fc_new
        fdir_surf_t_ref[:] = ft_new
        dir_bb_c_ref[:] = acc_c[:]
        dir_bb_t_ref[:] = acc_t[:]


def _sw_s2_kernel(gcounts, delta_gases, od_ref, ssa_ref, g_ref,
                  odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
                  mask_ref,
                  mu0_ref, ftc_ref, ftt_ref, alb0_ref, src0c_ref,
                  src0t_ref,
                  albb_c_ref, srcb_c_ref, albb_t_ref, srcb_t_ref,
                  top_c_ref, top_t_ref,
                  alb_c, src_c, alb_t, src_t):
    """Upward Möbius sweep for both scenes
    (radiation_adding_ica_sw.F90:24-153 upsweep)."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        alb_c[:] = alb0_ref[:]
        src_c[:] = src0c_ref[:]
        alb_t[:] = alb0_ref[:]
        src_t[:] = src0t_ref[:]

    cl, tot = _sw_layers(gcounts, delta_gases, od_ref, ssa_ref, g_ref,
                         odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                         exp_ref, mask_ref, mu0_ref)

    def advance(coeffs, fdir_top, alb, src, albb_ref, srcb_ref):
        refl, trans, rdir, tdd, _ = coeffs
        albedo = alb[:]
        source = src[:]
        albb_ref[0] = albedo
        srcb_ref[0] = source
        s_up = rdir * fdir_top
        s_dn = tdd * fdir_top
        inv = 1.0 / (1.0 - albedo * refl)
        alb[:] = refl + trans * trans * albedo * inv
        src[:] = s_up + trans * (source + albedo * s_dn) * inv

    advance(cl, ftc_ref[0], alb_c, src_c, albb_c_ref, srcb_c_ref)
    advance(tot, ftt_ref[0], alb_t, src_t, albb_t_ref, srcb_t_ref)

    @pl.when(l == nlev - 1)
    def _():
        top_c_ref[:] = src_c[:]
        top_t_ref[:] = src_t[:]


def _sw_s3_kernel(gcounts, delta_gases, od_ref, ssa_ref, g_ref,
                  odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
                  mask_ref,
                  mu0_ref, ftc_ref, ftt_ref,
                  albb_c_ref, srcb_c_ref, albb_t_ref, srcb_t_ref,
                  dn_bb_c_ref, up_bb_c_ref, dn_bb_t_ref, up_bb_t_ref,
                  fdn_surf_c_ref, fdn_surf_t_ref,
                  fdn_c, fdn_t, dnac, upac, dnat, upat):
    """Downward diffuse sweep for both scenes, emitting reduced
    profiles."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdn_c[:] = jnp.zeros_like(fdn_c)
        fdn_t[:] = jnp.zeros_like(fdn_t)

    cl, tot = _sw_layers(gcounts, delta_gases, od_ref, ssa_ref, g_ref,
                         odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                         exp_ref, mask_ref, mu0_ref)

    def advance(coeffs, fdir_top, fdn, albb_ref, srcb_ref, dna, upa):
        refl, trans, _, tdd, _ = coeffs
        alb_below = albb_ref[0]
        src_below = srcb_ref[0]
        inv = 1.0 / (1.0 - alb_below * refl)
        fdn_new = (trans * fdn[:] + refl * src_below
                   + tdd * fdir_top) * inv
        fup_new = alb_below * fdn_new + src_below
        fdn[:] = fdn_new
        dna[pl.ds(l, 1), :] = jnp.sum(fdn_new, axis=0, keepdims=True)
        upa[pl.ds(l, 1), :] = jnp.sum(fup_new, axis=0, keepdims=True)
        return fdn_new

    fdn_c_new = advance(cl, ftc_ref[0], fdn_c, albb_c_ref, srcb_c_ref,
                        dnac, upac)
    fdn_t_new = advance(tot, ftt_ref[0], fdn_t, albb_t_ref, srcb_t_ref,
                        dnat, upat)

    @pl.when(l == nlev - 1)
    def _():
        fdn_surf_c_ref[:] = fdn_c_new
        fdn_surf_t_ref[:] = fdn_t_new
        dn_bb_c_ref[:] = dnac[:]
        up_bb_c_ref[:] = upac[:]
        dn_bb_t_ref[:] = dnat[:]
        up_bb_t_ref[:] = upat[:]


def sw_fused(od, ssa, g, odc_b, ssac_b, gc_b, od_scaling, mask, mu0,
             incoming, alb_dif, alb_dir_mu0, gcounts, delta_gases):
    """Run the fused SW solver sweeps.

    Kernel-layout args: od/ssa/g/od_scaling (nlev, ng, ncolp);
    odc_b/ssac_b/gc_b (nlev, nband, ncolp); mask (nlev, 1, ncolp) 0/1;
    mu0 (1, ncolp) clamped; incoming/alb_dif/alb_dir_mu0 (ng, ncolp)."""
    nlev, ng, ncolp = od.shape
    nband = odc_b.shape[1]
    cb = _col_block(ncolp)
    dt = od.dtype
    grid = (ncolp // cb, nlev)

    lev = pl.BlockSpec((1, ng, cb), lambda i, l: (l, 0, i))
    rev = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - 1 - l, 0, i))
    lev_b = pl.BlockSpec((1, nband, cb), lambda i, l: (l, 0, i))
    rev_b = pl.BlockSpec((1, nband, cb),
                         lambda i, l: (nlev - 1 - l, 0, i))
    lev_m = pl.BlockSpec((1, 1, cb), lambda i, l: (l, 0, i))
    rev_m = pl.BlockSpec((1, 1, cb), lambda i, l: (nlev - 1 - l, 0, i))
    mu0_s = pl.BlockSpec((1, cb), lambda i, l: (0, i))
    col = pl.BlockSpec((ng, cb), lambda i, l: (0, i))
    bb = pl.BlockSpec((nlev, cb), lambda i, l: (0, i))
    exp_spec = pl.BlockSpec((ng, nband), lambda i, l: (0, 0))
    expand = jnp.asarray(band_expand_matrix(gcounts, dt))

    s1 = pl.pallas_call(
                functools.partial(_sw_s1_kernel, gcounts, delta_gases),
        grid=grid,
        in_specs=[lev, lev, lev, lev, lev_b, lev_b, lev_b, exp_spec,
                  lev_m, mu0_s, col],
        out_specs=(lev, lev, bb, bb, col, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, ssa, g, od_scaling, odc_b, ssac_b, gc_b, expand, mask, mu0,
      incoming)
    ftc, ftt, dir_bb_c, dir_bb_t, fdir_surf_c, fdir_surf_t = s1

    src0c = alb_dir_mu0 * fdir_surf_c
    src0t = alb_dir_mu0 * fdir_surf_t

    s2 = pl.pallas_call(
                functools.partial(_sw_s2_kernel, gcounts, delta_gases),
        grid=grid,
        in_specs=[rev, rev, rev, rev, rev_b, rev_b, rev_b, exp_spec,
                  rev_m, mu0_s, rev, rev, col, col, col],
        out_specs=(rev, rev, rev, rev, col, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt)],
    )(od, ssa, g, od_scaling, odc_b, ssac_b, gc_b, expand, mask, mu0,
      ftc, ftt, alb_dif, src0c, src0t)
    albb_c, srcb_c, albb_t, srcb_t, src_top_c, src_top_t = s2

    s3 = pl.pallas_call(
                functools.partial(_sw_s3_kernel, gcounts, delta_gases),
        grid=grid,
        in_specs=[lev, lev, lev, lev, lev_b, lev_b, lev_b, exp_spec,
                  lev_m, mu0_s, lev, lev, lev, lev, lev, lev],
        out_specs=(bb, bb, bb, bb, col, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, ssa, g, od_scaling, odc_b, ssac_b, gc_b, expand, mask, mu0,
      ftc, ftt, albb_c, srcb_c, albb_t, srcb_t)
    dn_bb_c, up_bb_c, dn_bb_t, up_bb_t, fdn_surf_c, fdn_surf_t = s3

    return dict(
        dir_bb_c=dir_bb_c, dir_bb_t=dir_bb_t,
        fdir_surf_c=fdir_surf_c, fdir_surf_t=fdir_surf_t,
        src_top_c=src_top_c, src_top_t=src_top_t,
        dn_bb_c=dn_bb_c, up_bb_c=up_bb_c,
        dn_bb_t=dn_bb_t, up_bb_t=up_bb_t,
        fdn_surf_c=fdn_surf_c, fdn_surf_t=fdn_surf_t)
