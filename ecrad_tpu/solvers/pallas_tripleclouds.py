"""Fully-fused Pallas Tripleclouds solvers: 3-region two-stream +
region merge + overlap-coupled adding sweeps in single TPU kernels.

Reference decomposition: radiation_tripleclouds_sw.F90:42-663 /
radiation_tripleclouds_lw.F90:38-607 compute per-region layer optics
(region 0 = clear sky, regions 1/2 = cloud with the 16th/84th-percentile
od scaling from radiation_regions.F90), then run adding sweeps whose
carries mix across regions at every interface through the overlap
matrices u/v (radiation_overlap.F90:280-459).

This module gives Tripleclouds the same treatment as pallas_mcica.py
(see its module notes for the rationale): each vertical sweep is ONE
kernel over a (column-block, level) grid that reads the *optical
inputs* (gas od/ssa/g, per-band cloud properties, the 2-region od
scalings), recomputes the per-region layer coefficients on the fly in
VMEM, and carries the per-region sweep state ((3, ng, cb) scratch) —
FLOPs traded for the HBM round trips of the unfused lax.scan path,
which at 137 levels ran at ~26% of the fused-McICA throughput.

The interface mixing uses the overlap matrices stacked as
(nlev+1, 9, ncolp) planes (k = 3*i + j), read one interface per grid
step; the mix is 9 multiply-adds on (ng, cb) tiles per carry.  The
clear scene (1 region) advances in the same kernels so the gas optics
are read once per sweep.

Numerics: the per-level math calls the SAME jnp functions and merge
expressions as the unfused path (solvers/two_stream.py,
tripleclouds._merge_regions), so results match to f32 roundoff.

Layout: kernel arrays are (nlev, ng, ncolp) / (nlev+1, ng, ncolp) with
columns on lanes, g on sublanes; per-band cloud arrays
(nlev, nband, ncolp); region-indexed level fields (nlev, 2|3, ncolp);
per-region g state (3, ng, ncolp); per-column planes (ng, ncolp).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ecrad_tpu.solvers import two_stream
from ecrad_tpu.solvers.pallas_mcica import (_VMEM_LIMIT, _col_block,
                                            _expand_bands,
                                            band_expand_matrix)

NREG = 3


def _mix_v(v9, x):
    """Interface mix with the v matrix: out[r] = sum_l v[l, r] * x[l]
    (the einsum "clr,clg->crg" of tripleclouds.up_step).  v9 (9, cb)
    stacked k = 3*l + r; x list of 3 (ng, cb) planes."""
    return [sum(v9[NREG * l + r: NREG * l + r + 1, :] * x[l]
                for l in range(NREG)) for r in range(NREG)]


def _mix_v_dn(v9, x):
    """Downward mix: out[l] = sum_r v[l, r] * x[r]
    (einsum "clr,crg->clg")."""
    return [sum(v9[NREG * l + r: NREG * l + r + 1, :] * x[r]
                for r in range(NREG)) for l in range(NREG)]


def _mix_u(u9, x):
    """Source mix with the u matrix: out[u] = sum_l u[u, l] * x[l]
    (einsum "cul,clg->cug")."""
    return [sum(u9[NREG * u + l: NREG * u + l + 1, :] * x[l]
                for l in range(NREG)) for u in range(NREG)]


def _sel3(cond, a, b):
    return [jnp.where(cond, a[r], b[r]) for r in range(NREG)]


# ===========================================================================
# Per-level region coefficients
# ===========================================================================


def _regions_sw(delta_gases, od_ref, ssa_ref, g_ref, odscal_ref,
                odcb_ref, ssacb_ref, gcb_ref, exp_ref, clear_ref,
                mu0_ref):
    """Clear-sky coefficients + per-region (0..2) SW coefficients at the
    current level.  Region 0 == clear sky; cloudy-region coefficients
    are zeroed in clear layers (tripleclouds with_regions semantics:
    clear_fill = 0 for all five SW coefficient sets)."""
    od = od_ref[0]
    ssa = ssa_ref[0]
    g = g_ref[0]
    mu0 = mu0_ref[0]                                  # (1, cb)
    clear = clear_ref[0] != 0.0                       # (1, cb)
    odcb = _expand_bands(odcb_ref[0], exp_ref)
    ssacb = _expand_bands(ssacb_ref[0], exp_ref)
    gcb = _expand_bands(gcb_ref[0], exp_ref)
    cl = two_stream.sw_ref_trans(mu0, od, ssa, g, pallas_safe=True)
    regs = [cl]
    for r in range(2):
        scal = odscal_ref[0][r:r + 1, :]              # (1, cb)
        odc = scal * odcb
        # tripleclouds._merge_regions expressions, verbatim
        scat_clear = ssa * od
        scat_cloud = ssacb * odc
        od_tot = od + odc
        scat = scat_clear + scat_cloud
        ssa_tot = scat / jnp.maximum(od_tot, 1e-300)
        g_tot = (g * scat_clear + gcb * scat_cloud) \
            / jnp.maximum(scat, 1e-300)
        if delta_gases:
            od_tot, ssa_tot, g_tot = two_stream.delta_eddington(
                od_tot, ssa_tot, g_tot)
        co = two_stream.sw_ref_trans(mu0, od_tot, ssa_tot, g_tot,
                                     pallas_safe=True)
        regs.append(tuple(jnp.where(clear, 0.0, c) for c in co))
    return cl, regs


def _regions_lw(od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                exp_ref, clear_ref, rf_ref, ptop, pbot):
    """Clear-sky (unscaled) LW coefficients + per-region coefficients
    with reg-frac-scaled sources (tripleclouds_lw.F90:200-204).
    Assumes do_lw_cloud_scattering and not do_lw_aerosol_scattering
    (the gating in tripleclouds.py enforces this)."""
    od = od_ref[0]
    clear = clear_ref[0] != 0.0
    rf = rf_ref[0]                                    # (3, cb)
    odcb = _expand_bands(odcb_ref[0], exp_ref)
    ssacb = _expand_bands(ssacb_ref[0], exp_ref)
    gcb = _expand_bands(gcb_ref[0], exp_ref)
    trans_c, su_c, sd_c = two_stream.lw_no_scattering_trans(
        od, ptop, pbot)
    zeros = jnp.zeros_like(trans_c)
    ones = jnp.ones_like(trans_c)
    rf0 = rf[0:1, :]
    regs = [(zeros, trans_c, su_c * rf0, sd_c * rf0)]
    for r in range(2):
        scal = odscal_ref[0][r:r + 1, :]
        odc = scal * odcb
        # _merge_regions with ssa = g = 0 for the clear part
        od_tot = od + odc
        scat = ssacb * odc
        ssa_tot = scat / jnp.maximum(od_tot, 1e-300)
        g_tot = (gcb * scat) / jnp.maximum(scat, 1e-300)
        refl, trans, su, sd = two_stream.lw_ref_trans(
            od_tot, ssa_tot, g_tot, ptop, pbot)
        # with_regions clear-layer fill: refl 0, trans 1, sources 0
        rfr = rf[r + 1:r + 2, :]
        regs.append((jnp.where(clear, 0.0, refl),
                     jnp.where(clear, 1.0, trans),
                     jnp.where(clear, 0.0, su) * rfr,
                     jnp.where(clear, 0.0, sd) * rfr))
    return (trans_c, su_c, sd_c), regs


# ===========================================================================
# LW kernels
# ===========================================================================


def _lw_up_kernel(od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                  exp_ref, clear_ref, rf_ref, ptop_ref, pbot_ref,
                  u9_ref, v9_ref, ccthis_ref, ccabove_ref,
                  fup0c_ref, alb0_ref, src0_ref,
                  albb_ref, srcb_ref, upbbc_ref, fuptoac_ref,
                  srctop_ref,
                  fup_c, alb_t, src_t, acc):
    """Upward pass: clear no-scattering up-sweep + 3-region Möbius
    up-sweep with u/v interface mixing (tripleclouds_lw.F90:212-254).
    Levels iterate surface -> TOA (reverse specs); the u/v refs index
    the interface ABOVE the current layer (v_mat[:, :-1] slice)."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fup_c[:] = fup0c_ref[:]
        alb_t[:] = alb0_ref[:]
        src_t[:] = src0_ref[:]

    (trans_c, su_c, _), regs = _regions_lw(
        od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
        clear_ref, rf_ref, ptop_ref[0], pbot_ref[0])

    # clear scene: affine up with UNSCALED sources
    fup_new = trans_c * fup_c[:] + su_c
    fup_c[:] = fup_new
    acc[pl.ds(nlev - 1 - l, 1), :] = jnp.sum(fup_new, axis=0,
                                             keepdims=True)

    # total scene: per-region Möbius up, then interface mixing
    albb_ref[0] = alb_t[:]
    srcb_ref[0] = src_t[:]
    alb_new, src_new = [], []
    for r in range(NREG):
        refl, trans, su, sd = regs[r]
        albedo = alb_t[r]
        source = src_t[r]
        inv = 1.0 / (1.0 - albedo * refl)
        alb_new.append(refl + trans * trans * albedo * inv)
        src_new.append(su + trans * (source + albedo * sd) * inv)
    u9 = u9_ref[0]
    v9 = v9_ref[0]
    skip = (ccthis_ref[0] != 0.0) & (ccabove_ref[0] != 0.0)
    alb_out = _sel3(skip, alb_new, _mix_v(v9, alb_new))
    src_out = _sel3(skip, src_new, _mix_u(u9, src_new))
    for r in range(NREG):
        alb_t[r] = alb_out[r]
        src_t[r] = src_out[r]

    @pl.when(l == nlev - 1)
    def _():
        fuptoac_ref[:] = fup_new
        upbbc_ref[:] = acc[:]
        srctop_ref[:] = src_t[:]


def _lw_dn_kernel(od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                  exp_ref, clear_ref, rf_ref, ptop_ref, pbot_ref,
                  v9_ref, ccthis_ref, ccbelow_ref,
                  albb_ref, srcb_ref,
                  dnbb_ref, upbb_ref, fdnsurf_ref, fupsurf_ref,
                  fdn_t, dn_acc, up_acc):
    """Total-sky downward sweep (tripleclouds_lw.F90:256-300); the v9
    ref indexes the interface BELOW the layer (v_mat[:, 1:] slice)."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdn_t[:] = jnp.zeros_like(fdn_t)

    _, regs = _regions_lw(
        od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
        clear_ref, rf_ref, ptop_ref[0], pbot_ref[0])
    clear = clear_ref[0] != 0.0
    fdn_new, fup_new = [], []
    for r in range(NREG):
        refl, trans, _, sd = regs[r]
        alb_below = albb_ref[0][r]
        src_below = srcb_ref[0][r]
        fdn = (trans * fdn_t[r] + refl * src_below + sd) \
            / (1.0 - refl * alb_below)
        fup = src_below + fdn * alb_below
        if r > 0:       # zero cloudy regions in clear layers (m mask)
            fdn = jnp.where(clear, 0.0, fdn)
            fup = jnp.where(clear, 0.0, fup)
        fdn_new.append(fdn)
        fup_new.append(fup)
    dn_acc[pl.ds(l, 1), :] = jnp.sum(sum(fdn_new), axis=0,
                                     keepdims=True)
    up_acc[pl.ds(l, 1), :] = jnp.sum(sum(fup_new), axis=0,
                                     keepdims=True)
    v9 = v9_ref[0]
    skip = (ccthis_ref[0] != 0.0) & (ccbelow_ref[0] != 0.0)
    fdn_out = _sel3(skip, fdn_new, _mix_v_dn(v9, fdn_new))
    for r in range(NREG):
        fdn_t[r] = fdn_out[r]

    @pl.when(l == nlev - 1)
    def _():
        fdnsurf_ref[:] = sum(fdn_new)
        fupsurf_ref[:] = sum(fup_new)
        dnbb_ref[:] = dn_acc[:]
        upbb_ref[:] = up_acc[:]


def _lw_deriv_kernel(od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                     exp_ref, clear_ref, rf_ref, ptop_ref, pbot_ref,
                     u9_ref, d0_ref, deriv_ref, dg, acc):
    """Region-coupled Hogan-Bozzo derivative upward pass
    (radiation_lw_derivatives.F90:200-250 calc_lw_derivatives_region):
    dg[u] = (sum_l u[u,l] dg[l]) * trans[u]; the u9 ref indexes the
    interface BELOW the layer (u_mat[:, 1:] slice, reversed)."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        dg[:] = d0_ref[:]

    _, regs = _regions_lw(
        od_ref, odscal_ref, odcb_ref, ssacb_ref, gcb_ref, exp_ref,
        clear_ref, rf_ref, ptop_ref[0], pbot_ref[0])
    u9 = u9_ref[0]
    mixed = _mix_u(u9, [dg[r] for r in range(NREG)])
    total = None
    for r in range(NREG):
        new = mixed[r] * regs[r][1]
        dg[r] = new
        total = new if total is None else total + new
    acc[pl.ds(nlev - 1 - l, 1), :] = jnp.sum(total, axis=0,
                                             keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        deriv_ref[:] = acc[:]


def lw_fused(od, odc_b, ssac_b, gc_b, od_scaling2, clear_m, rf3,
             u9, v9, cc_pad, planck_hl, emission, albedo, src0,
             gcounts, do_derivatives):
    """Run the fused Tripleclouds LW sweeps.

    Kernel-layout args: od (nlev, ng, ncolp); odc_b/ssac_b/gc_b
    (nlev, nband, ncolp); od_scaling2 (nlev, 2, ncolp);
    clear_m (nlev, 1, ncolp) 0/1; rf3 (nlev, 3, ncolp) region
    fractions; u9/v9 (nlev+1, 9, ncolp) overlap matrices (k = 3*i+j);
    cc_pad (nlev+2, 1, ncolp) clear-with-virtual-boundary indicator;
    planck_hl (nlev+1, ng, ncolp); emission/albedo (ng, ncolp);
    src0 (3, ng, ncolp) surface source per region."""
    from ecrad_tpu.solvers.pallas_mcica import _lw_p1_kernel

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
    lev_2 = pl.BlockSpec((1, 2, cb), lambda i, l: (l, 0, i))
    rev_2 = pl.BlockSpec((1, 2, cb), lambda i, l: (nlev - 1 - l, 0, i))
    lev_3 = pl.BlockSpec((1, NREG, cb), lambda i, l: (l, 0, i))
    rev_3 = pl.BlockSpec((1, NREG, cb),
                         lambda i, l: (nlev - 1 - l, 0, i))
    lev_9 = pl.BlockSpec((1, 9, cb), lambda i, l: (l, 0, i))
    ptop = pl.BlockSpec((1, ng, cb), lambda i, l: (l, 0, i))
    pbot = pl.BlockSpec((1, ng, cb), lambda i, l: (l + 1, 0, i))
    ptop_r = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - 1 - l, 0, i))
    pbot_r = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - l, 0, i))
    col = pl.BlockSpec((ng, cb), lambda i, l: (0, i))
    col3 = pl.BlockSpec((NREG, ng, cb), lambda i, l: (0, 0, i))
    reg = pl.BlockSpec((1, NREG, ng, cb), lambda i, l: (l, 0, 0, i))
    reg_r = pl.BlockSpec((1, NREG, ng, cb),
                         lambda i, l: (nlev - 1 - l, 0, 0, i))
    bb = pl.BlockSpec((nlev, cb), lambda i, l: (0, i))
    exp_spec = pl.BlockSpec((ng, nband), lambda i, l: (0, 0))
    expand = jnp.asarray(band_expand_matrix(gcounts, dt))
    # interface specs: up sweep (reverse level lr = nlev-1-l) uses the
    # interface ABOVE layer lr (index lr); dn sweep uses the interface
    # BELOW layer l (index l+1).  cc_pad index c = layer + 1.
    up_if = pl.BlockSpec((1, 9, cb), lambda i, l: (nlev - 1 - l, 0, i))
    dn_if = pl.BlockSpec((1, 9, cb), lambda i, l: (l + 1, 0, i))
    cc_this = pl.BlockSpec((1, 1, cb), lambda i, l: (l + 1, 0, i))
    cc_above = pl.BlockSpec((1, 1, cb), lambda i, l: (l, 0, i))
    cc_this_r = pl.BlockSpec((1, 1, cb), lambda i, l: (nlev - l, 0, i))
    cc_above_r = pl.BlockSpec((1, 1, cb),
                              lambda i, l: (nlev - 1 - l, 0, i))
    cc_below = pl.BlockSpec((1, 1, cb), lambda i, l: (l + 2, 0, i))

    # P1: clear-sky downward (shared with the McICA fused solver)
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
    alb0 = jnp.broadcast_to(albedo[None], (NREG, ng, ncolp)).astype(dt)

    # P2: clear up + 3-region Möbius up
    p2 = pl.pallas_call(
        _lw_up_kernel, grid=grid,
        in_specs=[rev, rev_2, rev_b, rev_b, rev_b, exp_spec, rev_m,
                  rev_3, ptop_r, pbot_r, up_if, up_if, cc_this_r,
                  cc_above_r, col, col3, col3],
        out_specs=(reg_r, reg_r, bb, col, col3),
        out_shape=(jax.ShapeDtypeStruct((nlev, NREG, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, NREG, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt),
                   jax.ShapeDtypeStruct((NREG, ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((NREG, ng, cb), dt),
                        pltpu.VMEM((NREG, ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, od_scaling2, odc_b, ssac_b, gc_b, expand, clear_m, rf3,
      planck_hl, planck_hl, u9, v9, cc_pad, cc_pad,
      fup_surf_c, alb0, src0)
    albb, srcb, up_bb_c, fup_toa_c, src_top_t = p2

    # P3: total-sky downward
    p3 = pl.pallas_call(
        _lw_dn_kernel, grid=grid,
        in_specs=[lev, lev_2, lev_b, lev_b, lev_b, exp_spec, lev_m,
                  lev_3, ptop, pbot, dn_if, cc_this, cc_below,
                  reg, reg],
        out_specs=(bb, bb, col, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((NREG, ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, od_scaling2, odc_b, ssac_b, gc_b, expand, clear_m, rf3,
      planck_hl, planck_hl, v9, cc_pad, cc_pad, albb, srcb)
    dn_bb_t, up_bb_t, fdn_surf_t, fup_surf_t = p3

    out = dict(dn_bb_c=dn_bb_c, fdn_surf_c=fdn_surf_c,
               fup_surf_c=fup_surf_c, up_bb_c=up_bb_c,
               fup_toa_c=fup_toa_c, src_top_t=src_top_t,
               dn_bb_t=dn_bb_t, up_bb_t=up_bb_t,
               fdn_surf_t=fdn_surf_t, fup_surf_t=fup_surf_t)

    if do_derivatives:
        eps = jnp.asarray(1e-30, dt)
        d0 = fup_surf_t / jnp.maximum(
            jnp.sum(fup_surf_t, axis=0, keepdims=True), eps)
        d0 = jnp.concatenate(
            [d0[None], jnp.zeros((NREG - 1, ng, ncolp), dt)], axis=0)
        # u at the interface BELOW the layer, reversed level order
        dn_if_r = pl.BlockSpec((1, 9, cb), lambda i, l: (nlev - l, 0, i))
        (deriv_t,) = pl.pallas_call(
            _lw_deriv_kernel, grid=grid,
            in_specs=[rev, rev_2, rev_b, rev_b, rev_b, exp_spec, rev_m,
                      rev_3, ptop_r, pbot_r, dn_if_r, col3],
            out_specs=(bb,),
            out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),),
            compiler_params=_VMEM_LIMIT,
            scratch_shapes=[pltpu.VMEM((NREG, ng, cb), dt),
                            pltpu.VMEM((nlev, cb), dt)],
        )(od, od_scaling2, odc_b, ssac_b, gc_b, expand, clear_m, rf3,
          planck_hl, planck_hl, u9, d0)
        out["deriv_t"] = deriv_t
    return out


# ===========================================================================
# SW kernels
# ===========================================================================


def _sw_dir_kernel(delta_gases, od_ref, ssa_ref, g_ref, odscal_ref,
                   odcb_ref, ssacb_ref, gcb_ref, exp_ref, clear_ref,
                   mu0_ref, inc_ref, fdir0_ref,
                   v9_ref, ccthis_ref, ccbelow_ref,
                   ftc_ref, ftt_ref, dirbbt_ref, fdirsurf_ref,
                   fdir_c, fdir_t, acc_t):
    """Direct-beam downward sweep: clear scene (full incoming) + the
    3-region scene with v-matrix interface mixing.  Emits the
    above-layer direct planes consumed by the up/down sweeps."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdir_c[:] = inc_ref[:]
        fdir_t[:] = fdir0_ref[:]

    cl, regs = _regions_sw(delta_gases, od_ref, ssa_ref, g_ref,
                           odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                           exp_ref, clear_ref, mu0_ref)
    clear = clear_ref[0] != 0.0
    ftc_ref[0] = fdir_c[:]
    ftt_ref[0] = fdir_t[:]
    fdir_c[:] = cl[4] * fdir_c[:]
    new = []
    for r in range(NREG):
        f = regs[r][4] * fdir_t[r]
        if r > 0:
            f = jnp.where(clear, 0.0, f)
        new.append(f)
    acc_t[pl.ds(l, 1), :] = jnp.sum(sum(new), axis=0, keepdims=True)
    v9 = v9_ref[0]
    skip = (ccthis_ref[0] != 0.0) & (ccbelow_ref[0] != 0.0)
    out = _sel3(skip, new, _mix_v_dn(v9, new))
    for r in range(NREG):
        fdir_t[r] = out[r]

    @pl.when(l == nlev - 1)
    def _():
        fdirsurf_ref[:] = sum(new)
        dirbbt_ref[:] = acc_t[:]


def _sw_up_kernel(delta_gases, od_ref, ssa_ref, g_ref, odscal_ref,
                  odcb_ref, ssacb_ref, gcb_ref, exp_ref, clear_ref,
                  mu0_ref, v9_ref, ccthis_ref, ccabove_ref,
                  alb0c_ref, albd0c_ref, alb0t_ref, albd0t_ref,
                  albbc_ref, albdbc_ref, albbt_ref, albdbt_ref,
                  albdtop_ref, albdtopc_ref,
                  alb_c, albd_c, alb_t, albd_t):
    """Upward sweep: diffuse + direct albedos for the clear scene and
    the 3 regions with v-matrix mixing
    (tripleclouds_sw.F90:250-306)."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        alb_c[:] = alb0c_ref[:]
        albd_c[:] = albd0c_ref[:]
        alb_t[:] = alb0t_ref[:]
        albd_t[:] = albd0t_ref[:]

    cl, regs = _regions_sw(delta_gases, od_ref, ssa_ref, g_ref,
                           odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                           exp_ref, clear_ref, mu0_ref)
    clear = clear_ref[0] != 0.0

    def advance(coeffs, albedo, albedo_d):
        refl, trans, rdir, tdd, tdir = coeffs
        inv = 1.0 / (1.0 - albedo * refl)
        alb_new = refl + trans * trans * albedo * inv
        albd_new = rdir + (tdir * albedo_d + tdd * albedo) * trans * inv
        return alb_new, albd_new

    albbc_ref[0] = alb_c[:]
    albdbc_ref[0] = albd_c[:]
    ac, adc = advance(cl, alb_c[:], albd_c[:])
    alb_c[:] = ac
    albd_c[:] = adc

    albbt_ref[0] = alb_t[:]
    albdbt_ref[0] = albd_t[:]
    alb_new, albd_new = [], []
    for r in range(NREG):
        a, ad = advance(regs[r], alb_t[r], albd_t[r])
        if r > 0:       # SW up_step m mask: zero cloudy r, clear layer
            a = jnp.where(clear, 0.0, a)
            ad = jnp.where(clear, 0.0, ad)
        alb_new.append(a)
        albd_new.append(ad)
    v9 = v9_ref[0]
    skip = (ccthis_ref[0] != 0.0) & (ccabove_ref[0] != 0.0)
    alb_out = _sel3(skip, alb_new, _mix_v(v9, alb_new))
    albd_out = _sel3(skip, albd_new, _mix_v(v9, albd_new))
    for r in range(NREG):
        alb_t[r] = alb_out[r]
        albd_t[r] = albd_out[r]

    @pl.when(l == nlev - 1)
    def _():
        albdtop_ref[:] = albd_t[:]
        albdtopc_ref[:] = albd_c[:]


def _sw_dn_kernel(delta_gases, od_ref, ssa_ref, g_ref, odscal_ref,
                  odcb_ref, ssacb_ref, gcb_ref, exp_ref, clear_ref,
                  mu0_ref, ftc_ref, ftt_ref,
                  albbc_ref, albdbc_ref, albbt_ref, albdbt_ref,
                  v9_ref, ccthis_ref, ccbelow_ref,
                  dnbbc_ref, upbbc_ref, dirbbc_ref, fdnsurfc_ref,
                  fdirsurfc_ref,
                  dnbbt_ref, upbbt_ref, fdnsurft_ref,
                  fdn_c, fdn_t, dnac, upac, dirac, dnat, upat):
    """Downward diffuse sweep for both scenes
    (tripleclouds_sw.F90:308-377), emitting reduced profiles; the
    direct beam is recomputed from the stored above-layer planes."""
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdn_c[:] = jnp.zeros_like(fdn_c)
        fdn_t[:] = jnp.zeros_like(fdn_t)

    cl, regs = _regions_sw(delta_gases, od_ref, ssa_ref, g_ref,
                           odscal_ref, odcb_ref, ssacb_ref, gcb_ref,
                           exp_ref, clear_ref, mu0_ref)
    clear = clear_ref[0] != 0.0

    def advance(coeffs, fdir_top, fdn_prev, alb_below, albd_below):
        refl, trans, _, tdd, tdir = coeffs
        fdn = (trans * fdn_prev
               + fdir_top * (tdir * albd_below * refl + tdd)) \
            / (1.0 - refl * alb_below)
        fdir = tdir * fdir_top
        fup = fdir * albd_below + fdn * alb_below
        return fdn, fdir, fup

    fdn_cn, fdir_cn, fup_cn = advance(cl, ftc_ref[0], fdn_c[:],
                                      albbc_ref[0], albdbc_ref[0])
    fdn_c[:] = fdn_cn
    dnac[pl.ds(l, 1), :] = jnp.sum(fdn_cn, axis=0, keepdims=True)
    upac[pl.ds(l, 1), :] = jnp.sum(fup_cn, axis=0, keepdims=True)
    dirac[pl.ds(l, 1), :] = jnp.sum(fdir_cn, axis=0, keepdims=True)

    fdn_new, fup_new = [], []
    for r in range(NREG):
        fdn, fdir, fup = advance(regs[r], ftt_ref[0][r], fdn_t[r],
                                 albbt_ref[0][r], albdbt_ref[0][r])
        if r > 0:
            fdn = jnp.where(clear, 0.0, fdn)
            fup = jnp.where(clear, 0.0, fup)
        fdn_new.append(fdn)
        fup_new.append(fup)
    dnat[pl.ds(l, 1), :] = jnp.sum(sum(fdn_new), axis=0, keepdims=True)
    upat[pl.ds(l, 1), :] = jnp.sum(sum(fup_new), axis=0, keepdims=True)
    v9 = v9_ref[0]
    skip = (ccthis_ref[0] != 0.0) & (ccbelow_ref[0] != 0.0)
    fdn_out = _sel3(skip, fdn_new, _mix_v_dn(v9, fdn_new))
    for r in range(NREG):
        fdn_t[r] = fdn_out[r]

    @pl.when(l == nlev - 1)
    def _():
        fdnsurfc_ref[:] = fdn_cn
        fdirsurfc_ref[:] = fdir_cn
        dnbbc_ref[:] = dnac[:]
        upbbc_ref[:] = upac[:]
        dirbbc_ref[:] = dirac[:]
        dnbbt_ref[:] = dnat[:]
        upbbt_ref[:] = upat[:]
        fdnsurft_ref[:] = sum(fdn_new)


def sw_fused(od, ssa, g, odc_b, ssac_b, gc_b, od_scaling2, clear_m,
             v9, cc_pad, mu0, incoming, fdir0, alb0_c, albd0_c,
             alb0_t, albd0_t, gcounts, delta_gases):
    """Run the fused Tripleclouds SW sweeps.  Shapes as in lw_fused;
    mu0 (1, ncolp) clamped; incoming (ng, ncolp) full TOA flux;
    fdir0 (3, ng, ncolp) region-weighted TOA direct; alb0/albd0 the
    surface (ng, ncolp) / (3, ng, ncolp) initial albedos (cloud-mask
    applied outside)."""
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
    lev_2 = pl.BlockSpec((1, 2, cb), lambda i, l: (l, 0, i))
    rev_2 = pl.BlockSpec((1, 2, cb), lambda i, l: (nlev - 1 - l, 0, i))
    mu0_s = pl.BlockSpec((1, cb), lambda i, l: (0, i))
    col = pl.BlockSpec((ng, cb), lambda i, l: (0, i))
    col3 = pl.BlockSpec((NREG, ng, cb), lambda i, l: (0, 0, i))
    reg = pl.BlockSpec((1, NREG, ng, cb), lambda i, l: (l, 0, 0, i))
    reg_r = pl.BlockSpec((1, NREG, ng, cb),
                         lambda i, l: (nlev - 1 - l, 0, 0, i))
    bb = pl.BlockSpec((nlev, cb), lambda i, l: (0, i))
    exp_spec = pl.BlockSpec((ng, nband), lambda i, l: (0, 0))
    expand = jnp.asarray(band_expand_matrix(gcounts, dt))
    up_if = pl.BlockSpec((1, 9, cb), lambda i, l: (nlev - 1 - l, 0, i))
    dn_if = pl.BlockSpec((1, 9, cb), lambda i, l: (l + 1, 0, i))
    cc_this = pl.BlockSpec((1, 1, cb), lambda i, l: (l + 1, 0, i))
    cc_above = pl.BlockSpec((1, 1, cb), lambda i, l: (l, 0, i))
    cc_this_r = pl.BlockSpec((1, 1, cb), lambda i, l: (nlev - l, 0, i))
    cc_above_r = pl.BlockSpec((1, 1, cb),
                              lambda i, l: (nlev - 1 - l, 0, i))
    cc_below = pl.BlockSpec((1, 1, cb), lambda i, l: (l + 2, 0, i))

    s1 = pl.pallas_call(
        functools.partial(_sw_dir_kernel, delta_gases), grid=grid,
        in_specs=[lev, lev, lev, lev_2, lev_b, lev_b, lev_b, exp_spec,
                  lev_m, mu0_s, col, col3, dn_if, cc_this, cc_below],
        out_specs=(lev, reg, bb, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, NREG, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((NREG, ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, ssa, g, od_scaling2, odc_b, ssac_b, gc_b, expand, clear_m,
      mu0, incoming, fdir0, v9, cc_pad, cc_pad)
    ftc, ftt, dir_bb_t, fdir_surf_t = s1

    s2 = pl.pallas_call(
        functools.partial(_sw_up_kernel, delta_gases), grid=grid,
        in_specs=[rev, rev, rev, rev_2, rev_b, rev_b, rev_b, exp_spec,
                  rev_m, mu0_s, up_if, cc_this_r, cc_above_r,
                  col, col, col3, col3],
        out_specs=(rev, rev, reg_r, reg_r, col3, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, NREG, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, NREG, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((NREG, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((NREG, ng, cb), dt),
                        pltpu.VMEM((NREG, ng, cb), dt)],
    )(od, ssa, g, od_scaling2, odc_b, ssac_b, gc_b, expand, clear_m,
      mu0, v9, cc_pad, cc_pad, alb0_c, albd0_c, alb0_t, albd0_t)
    albb_c, albdb_c, albb_t, albdb_t, albd_top, albd_top_c = s2

    s3 = pl.pallas_call(
        functools.partial(_sw_dn_kernel, delta_gases), grid=grid,
        in_specs=[lev, lev, lev, lev_2, lev_b, lev_b, lev_b, exp_spec,
                  lev_m, mu0_s, lev, reg, lev, lev, reg, reg,
                  dn_if, cc_this, cc_below],
        out_specs=(bb, bb, bb, col, col, bb, bb, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((NREG, ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(od, ssa, g, od_scaling2, odc_b, ssac_b, gc_b, expand, clear_m,
      mu0, ftc, ftt, albb_c, albdb_c, albb_t, albdb_t, v9, cc_pad,
      cc_pad)
    (dn_bb_c, up_bb_c, dir_bb_c, fdn_surf_c, fdir_surf_c,
     dn_bb_t, up_bb_t, fdn_surf_t) = s3

    return dict(
        albd_top=albd_top, albd_top_c=albd_top_c,
        dir_bb_c=dir_bb_c, dir_bb_t=dir_bb_t,
        fdir_surf_c=fdir_surf_c, fdir_surf_t=fdir_surf_t,
        dn_bb_c=dn_bb_c, up_bb_c=up_bb_c,
        dn_bb_t=dn_bb_t, up_bb_t=up_bb_t,
        fdn_surf_c=fdn_surf_c, fdn_surf_t=fdn_surf_t)
