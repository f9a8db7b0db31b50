"""Pallas TPU kernels for the adding-method vertical sweeps.

Reference recurrences: radiation_adding_ica_sw.F90:24-153 (adding_ica_sw)
and radiation_adding_ica_lw.F90:32-334 (adding_ica_lw +
calc_fluxes_no_scattering_lw) — the same math as solvers/adding.py, which
remains the CPU/golden path.

Why Pallas: the sweeps are sequential over ~137 levels with tiny per-level
elementwise work on (ng, ncol) planes.  As `lax.scan` each level costs a
while-loop iteration (dispatch overhead + carry copies); as
`associative_scan` the traffic is ~25x the minimum (profiled 165 ms/step
at ncol=2048 — 47% of the whole radiation step).  Here each sweep is ONE
kernel: layer properties stream HBM→VMEM once at full bandwidth, the
carry lives in VMEM scratch, and per-level outputs are reduced to
broadband (and optional per-band) sums in registers before they ever
touch HBM.  Measured effect: the whole adding path drops to the ~memory
lower bound (one read of each input).

Layout: kernels take (nlev, ng, ncolp) arrays — columns on lanes (128),
g on sublanes — with ncolp padded to a multiple of the column tile.  The
public wrappers accept the solver-standard (ncol, nlev, ng) arrays and
transpose; XLA already stores these arrays with ncol minor ({0,2,1}
layouts), so the transposes are cheap relayouts.

All wrappers are jit-safe, dtype-following, and pad-safe (padded columns
carry zeros: every recurrence maps 0 → 0 with no division hazard since
1/(1 - albedo*refl) = 1 there).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _col_block(ncolp):
    return min(ncolp, 512)


# ---------------------------------------------------------------------------
# LW no-scattering (calc_fluxes_no_scattering_lw): two affine sweeps


def _noscat_dn_kernel(trans_ref, s_dn_ref, dn_bb_ref, fdn_surf_ref, fdn,
                      bb_acc):
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdn[:] = jnp.zeros_like(fdn)

    fdn_new = trans_ref[0] * fdn[:] + s_dn_ref[0]
    fdn[:] = fdn_new
    bb_acc[pl.ds(l, 1), :] = jnp.sum(fdn_new, axis=0, keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        fdn_surf_ref[:] = fdn_new
        dn_bb_ref[:] = bb_acc[:]


def _noscat_up_kernel(trans_ref, s_up_ref, fup_surf_ref, up_bb_ref,
                      fup_toa_ref, fup, bb_acc):
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fup[:] = fup_surf_ref[:]

    fup_new = trans_ref[0] * fup[:] + s_up_ref[0]
    fup[:] = fup_new
    bb_acc[pl.ds(nlev - 1 - l, 1), :] = jnp.sum(fup_new, axis=0,
                                                keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        fup_toa_ref[:] = fup_new
        up_bb_ref[:] = bb_acc[:]


def lw_noscat_sweeps(trans, s_up, s_dn, emission_surf, albedo_surf):
    """Inputs (nlev, ng, ncolp); emission/albedo_surf (ng, ncolp).

    Returns (dn_bb (nlev, ncolp), fdn_surf (ng, ncolp),
             up_bb (nlev, ncolp), fup_toa (ng, ncolp),
             fup_surf (ng, ncolp))."""
    nlev, ng, ncolp = trans.shape
    cb = _col_block(ncolp)
    dt = trans.dtype
    grid = (ncolp // cb, nlev)

    lev_spec = pl.BlockSpec((1, ng, cb), lambda i, l: (l, 0, i))
    rev_spec = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - 1 - l, 0, i))
    col_spec = pl.BlockSpec((ng, cb), lambda i, l: (0, i))
    bb_spec = pl.BlockSpec((nlev, cb), lambda i, l: (0, i))

    dn_bb, fdn_surf = pl.pallas_call(
        _noscat_dn_kernel,
        grid=grid,
        in_specs=[lev_spec, lev_spec],
        out_specs=(bb_spec, col_spec),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(trans, s_dn)

    fup_surf = emission_surf + albedo_surf * fdn_surf

    up_bb, fup_toa = pl.pallas_call(
        _noscat_up_kernel,
        grid=grid,
        in_specs=[rev_spec, rev_spec, col_spec],
        out_specs=(bb_spec, col_spec),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(trans, s_up, fup_surf)

    return dn_bb, fdn_surf, up_bb, fup_toa, fup_surf


# ---------------------------------------------------------------------------
# Scattering up-sweep (Möbius carry) + down-sweep — shared by LW scat & SW


def _scat_up_kernel(refl_ref, trans_ref, s_up_ref, s_dn_ref, alb0_ref,
                    src0_ref, alb_below_ref, src_below_ref, src_top_ref,
                    alb, src):
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        alb[:] = alb0_ref[:]
        src[:] = src0_ref[:]

    albedo = alb[:]
    source = src[:]
    refl = refl_ref[0]
    trans = trans_ref[0]
    # state below this layer (the carry before applying it)
    alb_below_ref[0] = albedo
    src_below_ref[0] = source
    inv = 1.0 / (1.0 - albedo * refl)
    alb[:] = refl + trans * trans * albedo * inv
    src[:] = s_up_ref[0] + trans * (source + albedo * s_dn_ref[0]) * inv

    @pl.when(l == nlev - 1)
    def _():
        src_top_ref[:] = src[:]


def _scat_dn_kernel(trans_ref, refl_ref, s_dn_ref, alb_below_ref,
                    src_below_ref, dn_bb_ref, up_bb_ref, fdn_surf_ref,
                    fdn, dn_acc, up_acc):
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdn[:] = jnp.zeros_like(fdn)

    alb_below = alb_below_ref[0]
    src_below = src_below_ref[0]
    refl = refl_ref[0]
    inv = 1.0 / (1.0 - alb_below * refl)
    fdn_new = (trans_ref[0] * fdn[:] + refl * src_below
               + s_dn_ref[0]) * inv
    fup_new = alb_below * fdn_new + src_below
    fdn[:] = fdn_new
    dn_acc[pl.ds(l, 1), :] = jnp.sum(fdn_new, axis=0, keepdims=True)
    up_acc[pl.ds(l, 1), :] = jnp.sum(fup_new, axis=0, keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        fdn_surf_ref[:] = fdn_new
        dn_bb_ref[:] = dn_acc[:]
        up_bb_ref[:] = up_acc[:]


def scat_sweeps(refl, trans, s_up, s_dn, alb0, src0):
    """Möbius up-sweep + affine down-sweep (the scattering adding method).

    Inputs (nlev, ng, ncolp) layer props; alb0/src0 (ng, ncolp) surface
    state.  Returns (dn_bb, up_bb (nlev, ncolp) at half-levels 1..nlev,
    src_top (ng, ncolp) = TOA upwelling, fdn_surf (ng, ncolp),
    alb_below, src_below (nlev, ng, ncolp))."""
    nlev, ng, ncolp = refl.shape
    cb = _col_block(ncolp)
    dt = refl.dtype
    grid = (ncolp // cb, nlev)

    rev_spec = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - 1 - l, 0, i))
    lev_spec = pl.BlockSpec((1, ng, cb), lambda i, l: (l, 0, i))
    col_spec = pl.BlockSpec((ng, cb), lambda i, l: (0, i))
    bb_spec = pl.BlockSpec((nlev, cb), lambda i, l: (0, i))

    alb_below, src_below, src_top = pl.pallas_call(
        _scat_up_kernel,
        grid=grid,
        in_specs=[rev_spec, rev_spec, rev_spec, rev_spec, col_spec,
                  col_spec],
        out_specs=(rev_spec, rev_spec, col_spec),
        out_shape=(jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt)],
    )(refl, trans, s_up, s_dn, alb0, src0)

    dn_bb, up_bb, fdn_surf = pl.pallas_call(
        _scat_dn_kernel,
        grid=grid,
        in_specs=[lev_spec, lev_spec, lev_spec, lev_spec, lev_spec],
        out_specs=(bb_spec, bb_spec, col_spec),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(trans, refl, s_dn, alb_below, src_below)

    return dn_bb, up_bb, src_top, fdn_surf


# ---------------------------------------------------------------------------
# SW: direct-beam sweep, then scattering sweeps with in-kernel sources


def _sw_dir_kernel(tdirdir_ref, inc_ref, fdir_top_ref, dir_bb_ref,
                   fdir_surf_ref, fdir, bb_acc):
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdir[:] = inc_ref[:]

    fdir_top_ref[0] = fdir[:]
    fdir_new = tdirdir_ref[0] * fdir[:]
    fdir[:] = fdir_new
    bb_acc[pl.ds(l, 1), :] = jnp.sum(fdir_new, axis=0, keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        fdir_surf_ref[:] = fdir_new
        dir_bb_ref[:] = bb_acc[:]


def _sw_up_kernel(refl_ref, trans_ref, rdir_ref, tdd_ref, fdir_top_ref,
                  alb0_ref, src0_ref, alb_below_ref, src_below_ref,
                  src_top_ref, alb, src):
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        alb[:] = alb0_ref[:]
        src[:] = src0_ref[:]

    albedo = alb[:]
    source = src[:]
    refl = refl_ref[0]
    trans = trans_ref[0]
    fdir_top = fdir_top_ref[0]
    s_up = rdir_ref[0] * fdir_top
    s_dn = tdd_ref[0] * fdir_top
    alb_below_ref[0] = albedo
    src_below_ref[0] = source
    inv = 1.0 / (1.0 - albedo * refl)
    alb[:] = refl + trans * trans * albedo * inv
    src[:] = s_up + trans * (source + albedo * s_dn) * inv

    @pl.when(l == nlev - 1)
    def _():
        src_top_ref[:] = src[:]


def _sw_dn_kernel(trans_ref, refl_ref, tdd_ref, fdir_top_ref,
                  alb_below_ref, src_below_ref, dn_bb_ref, up_bb_ref,
                  fdn_surf_ref, fdn, dn_acc, up_acc):
    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        fdn[:] = jnp.zeros_like(fdn)

    alb_below = alb_below_ref[0]
    src_below = src_below_ref[0]
    refl = refl_ref[0]
    inv = 1.0 / (1.0 - alb_below * refl)
    fdn_new = (trans_ref[0] * fdn[:] + refl * src_below
               + tdd_ref[0] * fdir_top_ref[0]) * inv
    fup_new = alb_below * fdn_new + src_below
    fdn[:] = fdn_new
    dn_acc[pl.ds(l, 1), :] = jnp.sum(fdn_new, axis=0, keepdims=True)
    up_acc[pl.ds(l, 1), :] = jnp.sum(fup_new, axis=0, keepdims=True)

    @pl.when(l == nlev - 1)
    def _():
        fdn_surf_ref[:] = fdn_new
        dn_bb_ref[:] = dn_acc[:]
        up_bb_ref[:] = up_acc[:]


def sw_sweeps(refl, trans, rdir, tdd, tdirdir, incoming, alb0_dif,
              alb0_dir_x_mu0):
    """All three SW sweeps.  Inputs (nlev, ng, ncolp) layer props;
    incoming/alb0_* (ng, ncolp).  alb0_dir_x_mu0 = direct surface albedo
    * mu0 (the source term scale applied to the surface direct flux).

    Returns (dir_bb, dn_bb, up_bb (nlev, ncolp), fdir_surf, fdn_surf,
    src_top (ng, ncolp))."""
    nlev, ng, ncolp = refl.shape
    cb = _col_block(ncolp)
    dt = refl.dtype
    grid = (ncolp // cb, nlev)

    rev_spec = pl.BlockSpec((1, ng, cb), lambda i, l: (nlev - 1 - l, 0, i))
    lev_spec = pl.BlockSpec((1, ng, cb), lambda i, l: (l, 0, i))
    col_spec = pl.BlockSpec((ng, cb), lambda i, l: (0, i))
    bb_spec = pl.BlockSpec((nlev, cb), lambda i, l: (0, i))

    fdir_top, dir_bb, fdir_surf = pl.pallas_call(
        _sw_dir_kernel,
        grid=grid,
        in_specs=[lev_spec, col_spec],
        out_specs=(lev_spec, bb_spec, col_spec),
        out_shape=(jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(tdirdir, incoming)

    src0 = alb0_dir_x_mu0 * fdir_surf

    alb_below, src_below, src_top = pl.pallas_call(
        _sw_up_kernel,
        grid=grid,
        in_specs=[rev_spec, rev_spec, rev_spec, rev_spec, rev_spec,
                  col_spec, col_spec],
        out_specs=(rev_spec, rev_spec, col_spec),
        out_shape=(jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ng, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((ng, cb), dt)],
    )(refl, trans, rdir, tdd, fdir_top, alb0_dif, src0)

    dn_bb, up_bb, fdn_surf = pl.pallas_call(
        _sw_dn_kernel,
        grid=grid,
        in_specs=[lev_spec, lev_spec, lev_spec, lev_spec, lev_spec,
                  lev_spec],
        out_specs=(bb_spec, bb_spec, col_spec),
        out_shape=(jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((nlev, ncolp), dt),
                   jax.ShapeDtypeStruct((ng, ncolp), dt)),
        scratch_shapes=[pltpu.VMEM((ng, cb), dt),
                        pltpu.VMEM((nlev, cb), dt),
                        pltpu.VMEM((nlev, cb), dt)],
    )(trans, refl, tdd, fdir_top, alb_below, src_below)

    return dir_bb, dn_bb, up_bb, fdir_surf, fdn_surf, src_top
