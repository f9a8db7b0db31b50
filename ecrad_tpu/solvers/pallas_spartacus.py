"""Pallas sweep kernels for the SPARTACUS adding passes.

The SPARTACUS up/down sweeps are 137-step lax.scan recurrences over
~25 small (ncol, ng) planes per step — measured ~95 ms of the 200 ms
solver at ncol=512 on TPU v5e, dominated by per-iteration overhead and
unfused HBM round trips.  Here each sweep is ONE kernel over a
(column-block, level) grid: the per-region carry planes live in VMEM
scratch and every step calls the SAME plane-form core math as the scan
path (spartacus._sw_up_core etc.), so the two paths are identical by
construction (plus the on-device equivalence smoke).

Layout: unlike pallas_mcica (columns on lanes), these kernels keep the
solver's native plane orientation — columns on SUBLANES, g on LANES —
so the stacked (nlev, 9, ncol, ng) layer matrices from the lax.map
phase feed straight in with NO relayout.  Per-column scalars travel as
(nlev, ncol, K) stacks whose blocks load as broadcast-ready (cbc, K)
tiles.  ng pads to the 128-lane tile (112 -> 1.14x, 140 -> 1.83x);
acceptable against the relayout alternative.

Requires ncol divisible by the 128-sublane block; callers fall back to
the lax.scan path otherwise (and always on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NREG = 3
_N2 = NREG * NREG
_VMEM_LIMIT = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _col_rows(ncol):
    """Column (sublane) block: largest power-of-two <= 512 dividing
    ncol; None if ncol isn't tileable (caller falls back to scan)."""
    for cb in (512, 256, 128):
        if ncol % cb == 0:
            return cb
    return None


def _mats5(refs):
    return tuple([[r[0][NREG * i + j] for j in range(NREG)]
                  for i in range(NREG)] for r in refs)


def _b9(ref):
    v = ref[0]                                    # (cbc, 9)
    return [v[:, k:k + 1] for k in range(_N2)]


# ---------------------------------------------------------------------------
# SW kernels
# ---------------------------------------------------------------------------


def _sw_up_kernel(opts, R_ref, T_ref, Rd_ref, Tdd_ref, Tdir_ref,
                  rcl_ref, tcl_ref, rdcl_ref, tddcl_ref, tdircl_ref,
                  u9_ref, v9_ref, msk_ref, ent_ref,
                  alb0_ref, albd0_ref, albc0_ref, albdc0_ref,
                  albb_ref, albdb_ref, albcb_ref, albdcb_ref,
                  albdf_ref, albcf_ref, albdcf_ref,
                  alb_s, albd_s, albc_s, albdc_s, xdif_s, xdir_s):
    """Reverse (surface -> TOA) SW up sweep; emits the ENTRY carry per
    level (albedo of the atmosphere below) and the final post-TOA
    carry."""
    from ecrad_tpu.solvers.spartacus import _sw_up_core

    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        alb_s[:] = alb0_ref[:]
        albd_s[:] = albd0_ref[:]
        albc_s[:] = albc0_ref[:]
        albdc_s[:] = albdc0_ref[:]
        xdif_s[:] = jnp.zeros_like(xdif_s)
        xdir_s[:] = jnp.zeros_like(xdir_s)

    # emit this level's ys = entry carry
    albb_ref[0] = alb_s[:]
    albdb_ref[0] = albd_s[:]
    albcb_ref[0] = albc_s[:]
    albdcb_ref[0] = albdc_s[:]

    mats = _mats5((R_ref, T_ref, Rd_ref, Tdd_ref, Tdir_ref))
    cl5 = (rcl_ref[0], tcl_ref[0], rdcl_ref[0], tddcl_ref[0],
           tdircl_ref[0])
    u9b = _b9(u9_ref)
    v9b = _b9(v9_ref)
    m = msk_ref[0]                                  # (cbc, 4) 0/1
    msk = tuple(m[:, k:k + 1] != 0.0 for k in range(4))
    e = ent_ref[0]                                  # (cbc, 13)
    ent = ([e[:, r:r + 1] for r in range(3)],
           [e[:, 3 + r:4 + r] for r in range(3)],
           [e[:, 6 + r:7 + r] for r in range(3)],
           e[:, 9:10], e[:, 10:11], e[:, 11:12], e[:, 12:13])

    carry = ([[alb_s[NREG * i + j] for j in range(NREG)]
              for i in range(NREG)],
             [[albd_s[NREG * i + j] for j in range(NREG)]
              for i in range(NREG)],
             albc_s[:], albdc_s[:],
             [xdif_s[r] for r in range(NREG)],
             [xdir_s[r] for r in range(NREG)])
    alb_n, albd_n, albc_n, albdc_n, xdif_n, xdir_n = _sw_up_core(
        carry, mats, cl5, u9b, v9b, msk, ent, opts)
    for i in range(NREG):
        for j in range(NREG):
            alb_s[NREG * i + j] = alb_n[i][j]
            albd_s[NREG * i + j] = albd_n[i][j]
        xdif_s[i] = xdif_n[i]
        xdir_s[i] = xdir_n[i]
    albc_s[:] = albc_n
    albdc_s[:] = albdc_n

    @pl.when(l == nlev - 1)
    def _():
        albdf_ref[:] = albd_s[:]
        albcf_ref[:] = albc_s[:]
        albdcf_ref[:] = albdc_s[:]


def _sw_dn_kernel(R_ref, T_ref, Rd_ref, Tdd_ref, Tdir_ref,
                  rcl_ref, tcl_ref, rdcl_ref, tddcl_ref, tdircl_ref,
                  albb_ref, albdb_ref, albcb_ref, albdcb_ref,
                  v9_ref, msk_ref, ddn0_ref, inc_ref,
                  fup_ref, fdn_ref, fdir_ref, fupc_ref, fdnc_ref,
                  fdirc_ref,
                  fdn_s, ddn_s, fdnc_s, ddnc_s):
    """Forward (TOA -> surface) SW down sweep; v9_ref indexes the
    interface BELOW the layer."""
    from ecrad_tpu.solvers.spartacus import _sw_dn_core

    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        fdn_s[:] = jnp.zeros_like(fdn_s)
        ddn_s[:] = ddn0_ref[:]
        fdnc_s[:] = jnp.zeros_like(fdnc_s)
        ddnc_s[:] = inc_ref[:]

    mats = _mats5((R_ref, T_ref, Rd_ref, Tdd_ref, Tdir_ref))
    cl5 = (rcl_ref[0], tcl_ref[0], rdcl_ref[0], tddcl_ref[0],
           tdircl_ref[0])
    below = ([[albb_ref[0][NREG * i + j] for j in range(NREG)]
              for i in range(NREG)],
             [[albdb_ref[0][NREG * i + j] for j in range(NREG)]
              for i in range(NREG)],
             albcb_ref[0], albdcb_ref[0])
    v9b = _b9(v9_ref)
    m = msk_ref[0]
    msk = (m[:, 0:1] != 0.0, m[:, 1:2] != 0.0)
    carry = ([fdn_s[r] for r in range(NREG)],
             [ddn_s[r] for r in range(NREG)], fdnc_s[:], ddnc_s[:])
    (fdn_n, ddn_n, fdnc_n, ddnc_n), ys = _sw_dn_core(
        carry, mats, cl5, below, v9b, msk)
    fup_sum, fdn_sum, ddn_sum, fup_c, fdn_c2, ddn_c2 = ys
    for r in range(NREG):
        fdn_s[r] = fdn_n[r]
        ddn_s[r] = ddn_n[r]
    fdnc_s[:] = fdnc_n
    ddnc_s[:] = ddnc_n
    fup_ref[0] = fup_sum
    fdn_ref[0] = fdn_sum
    fdir_ref[0] = ddn_sum
    fupc_ref[0] = fup_c
    fdnc_ref[0] = fdn_c2
    fdirc_ref[0] = ddn_c2


def sw_sweeps(opts, Rs, Ts, Rds, Tdds, Tdirs, cl5, u9c, v9top, v9bot,
              msk_up, msk_dn, ent13, alb0, albd0, albc0, albdc0,
              ddn0, incoming):
    """Run both SW sweeps.  Shapes: Rs.. (nlev, 9, ncol, ng);
    cl5 tuple of (nlev, ncol, ng); u9c/v9* (nlev, ncol, 9);
    msk_up (nlev, ncol, 4) / msk_dn (nlev, ncol, 2) 0/1;
    ent13 (nlev, ncol, 13); alb0/albd0/ddn0 (9|9|3, ncol, ng);
    albc0/albdc0/incoming (ncol, ng).

    Returns (albd_f (9, ncol, ng), alb_c_f, albd_c_f,
    (fup, fdn, fdir, fup_c, fdn_c, fdir_c) each (nlev, ncol, ng))."""
    nlev, _, ncol, ng = Rs.shape
    cbc = _col_rows(ncol)
    dt = Rs.dtype
    grid = (ncol // cbc, nlev)

    rev9 = pl.BlockSpec((1, _N2, cbc, ng),
                        lambda i, l: (nlev - 1 - l, 0, i, 0))
    lev9 = pl.BlockSpec((1, _N2, cbc, ng), lambda i, l: (l, 0, i, 0))
    rev_g = pl.BlockSpec((1, cbc, ng), lambda i, l: (nlev - 1 - l, i, 0))
    lev_g = pl.BlockSpec((1, cbc, ng), lambda i, l: (l, i, 0))
    revK = lambda K: pl.BlockSpec((1, cbc, K),
                                  lambda i, l: (nlev - 1 - l, i, 0))
    levK = lambda K: pl.BlockSpec((1, cbc, K), lambda i, l: (l, i, 0))
    col9 = pl.BlockSpec((_N2, cbc, ng), lambda i, l: (0, i, 0))
    col3 = pl.BlockSpec((NREG, cbc, ng), lambda i, l: (0, i, 0))
    col = pl.BlockSpec((cbc, ng), lambda i, l: (i, 0))

    up = pl.pallas_call(
        functools.partial(_sw_up_kernel, opts), grid=grid,
        in_specs=[rev9] * 5 + [rev_g] * 5
        + [revK(9), revK(9), revK(4), revK(13)]
        + [col9, col9, col, col],
        out_specs=(rev9, rev9, rev_g, rev_g, col9, col, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, _N2, ncol, ng), dt),
                   jax.ShapeDtypeStruct((nlev, _N2, ncol, ng), dt),
                   jax.ShapeDtypeStruct((nlev, ncol, ng), dt),
                   jax.ShapeDtypeStruct((nlev, ncol, ng), dt),
                   jax.ShapeDtypeStruct((_N2, ncol, ng), dt),
                   jax.ShapeDtypeStruct((ncol, ng), dt),
                   jax.ShapeDtypeStruct((ncol, ng), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((_N2, cbc, ng), dt),
                        pltpu.VMEM((_N2, cbc, ng), dt),
                        pltpu.VMEM((cbc, ng), dt),
                        pltpu.VMEM((cbc, ng), dt),
                        pltpu.VMEM((NREG, cbc, ng), dt),
                        pltpu.VMEM((NREG, cbc, ng), dt)],
    )(Rs, Ts, Rds, Tdds, Tdirs, *cl5, u9c, v9top, msk_up, ent13,
      alb0, albd0, albc0, albdc0)
    albb, albdb, albcb, albdcb, albd_f, alb_c_f, albd_c_f = up

    dn = pl.pallas_call(
        _sw_dn_kernel, grid=grid,
        in_specs=[lev9] * 5 + [lev_g] * 5 + [lev9, lev9, lev_g, lev_g]
        + [levK(9), levK(2), col3, col],
        out_specs=(lev_g,) * 6,
        out_shape=tuple(jax.ShapeDtypeStruct((nlev, ncol, ng), dt)
                        for _ in range(6)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((NREG, cbc, ng), dt),
                        pltpu.VMEM((NREG, cbc, ng), dt),
                        pltpu.VMEM((cbc, ng), dt),
                        pltpu.VMEM((cbc, ng), dt)],
    )(Rs, Ts, Rds, Tdds, Tdirs, *cl5, albb, albdb, albcb, albdcb,
      v9bot, msk_dn, ddn0, incoming)

    return albd_f, alb_c_f, albd_c_f, dn


# ---------------------------------------------------------------------------
# LW kernels
# ---------------------------------------------------------------------------


def _lw_up_kernel(opts, R_ref, T_ref, SU_ref, SD_ref,
                  rcl_ref, tcl_ref, sucl_ref, sdcl_ref,
                  u9_ref, v9_ref, msk_ref,
                  alb0_ref, src0_ref, albc0_ref, srcc0_ref,
                  albb_ref, srcb_ref, albcb_ref, srccb_ref,
                  srcf_ref, srccf_ref,
                  alb_s, src_s, albc_s, srcc_s):
    from ecrad_tpu.solvers.spartacus import _lw_up_core

    l = pl.program_id(1)
    nlev = pl.num_programs(1)

    @pl.when(l == 0)
    def _():
        alb_s[:] = alb0_ref[:]
        src_s[:] = src0_ref[:]
        albc_s[:] = albc0_ref[:]
        srcc_s[:] = srcc0_ref[:]

    albb_ref[0] = alb_s[:]
    srcb_ref[0] = src_s[:]
    albcb_ref[0] = albc_s[:]
    srccb_ref[0] = srcc_s[:]

    mats = ([[R_ref[0][NREG * i + j] for j in range(NREG)]
             for i in range(NREG)],
            [[T_ref[0][NREG * i + j] for j in range(NREG)]
             for i in range(NREG)],
            [SU_ref[0][r] for r in range(NREG)],
            [SD_ref[0][r] for r in range(NREG)])
    cl4 = (rcl_ref[0], tcl_ref[0], sucl_ref[0], sdcl_ref[0])
    m = msk_ref[0]
    msk = (m[:, 0:1] != 0.0, m[:, 1:2] != 0.0)
    carry = ([[alb_s[NREG * i + j] for j in range(NREG)]
              for i in range(NREG)],
             [src_s[r] for r in range(NREG)], albc_s[:], srcc_s[:])
    alb_n, src_n, albc_n, srcc_n = _lw_up_core(
        carry, mats, cl4, _b9(u9_ref), _b9(v9_ref), msk, opts)
    for i in range(NREG):
        for j in range(NREG):
            alb_s[NREG * i + j] = alb_n[i][j]
        src_s[i] = src_n[i]
    albc_s[:] = albc_n
    srcc_s[:] = srcc_n

    @pl.when(l == nlev - 1)
    def _():
        srcf_ref[:] = src_s[:]
        srccf_ref[:] = srcc_s[:]


def _lw_dn_kernel(R_ref, T_ref, SU_ref, SD_ref,
                  rcl_ref, tcl_ref, sucl_ref, sdcl_ref,
                  srcb_ref, albb_ref, srccb_ref, albcb_ref,
                  v9_ref, msk_ref,
                  fup_ref, fdn_ref, fupc_ref, fdnc_ref,
                  fdn_s, fdnc_s):
    from ecrad_tpu.solvers.spartacus import _lw_dn_core

    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        fdn_s[:] = jnp.zeros_like(fdn_s)
        fdnc_s[:] = jnp.zeros_like(fdnc_s)

    mats = ([[R_ref[0][NREG * i + j] for j in range(NREG)]
             for i in range(NREG)],
            [[T_ref[0][NREG * i + j] for j in range(NREG)]
             for i in range(NREG)],
            [SU_ref[0][r] for r in range(NREG)],
            [SD_ref[0][r] for r in range(NREG)])
    cl4 = (rcl_ref[0], tcl_ref[0], sucl_ref[0], sdcl_ref[0])
    below = ([srcb_ref[0][r] for r in range(NREG)],
             [[albb_ref[0][NREG * i + j] for j in range(NREG)]
              for i in range(NREG)],
             srccb_ref[0], albcb_ref[0])
    m = msk_ref[0]
    msk = (m[:, 0:1] != 0.0, m[:, 1:2] != 0.0)
    carry = ([fdn_s[r] for r in range(NREG)], fdnc_s[:])
    (fdn_n, fdnc_n), ys = _lw_dn_core(carry, mats, cl4, below,
                                      _b9(v9_ref), msk)
    fup_sum, fdn_sum, fup_c, fdn_c2 = ys
    for r in range(NREG):
        fdn_s[r] = fdn_n[r]
    fdnc_s[:] = fdnc_n
    fup_ref[0] = fup_sum
    fdn_ref[0] = fdn_sum
    fupc_ref[0] = fup_c
    fdnc_ref[0] = fdn_c2


def lw_sweeps(opts, Rs, Ts, SUs, SDs, cl4, u9c, v9top, v9bot,
              msk_up, msk_dn, alb0, src0, albc0, srcc0):
    """Run both LW sweeps.  Rs/Ts (nlev, 9, ncol, ng); SUs/SDs
    (nlev, 3, ncol, ng); cl4 tuple of (nlev, ncol, ng); interface and
    mask stacks as in sw_sweeps.

    Returns (src_f (3, ncol, ng), src_c_f (ncol, ng),
    (fup, fdn, fup_c, fdn_c) each (nlev, ncol, ng))."""
    nlev, _, ncol, ng = Rs.shape
    cbc = _col_rows(ncol)
    dt = Rs.dtype
    grid = (ncol // cbc, nlev)

    rev9 = pl.BlockSpec((1, _N2, cbc, ng),
                        lambda i, l: (nlev - 1 - l, 0, i, 0))
    lev9 = pl.BlockSpec((1, _N2, cbc, ng), lambda i, l: (l, 0, i, 0))
    rev3 = pl.BlockSpec((1, NREG, cbc, ng),
                        lambda i, l: (nlev - 1 - l, 0, i, 0))
    lev3 = pl.BlockSpec((1, NREG, cbc, ng), lambda i, l: (l, 0, i, 0))
    rev_g = pl.BlockSpec((1, cbc, ng), lambda i, l: (nlev - 1 - l, i, 0))
    lev_g = pl.BlockSpec((1, cbc, ng), lambda i, l: (l, i, 0))
    revK = lambda K: pl.BlockSpec((1, cbc, K),
                                  lambda i, l: (nlev - 1 - l, i, 0))
    levK = lambda K: pl.BlockSpec((1, cbc, K), lambda i, l: (l, i, 0))
    col9 = pl.BlockSpec((_N2, cbc, ng), lambda i, l: (0, i, 0))
    col3 = pl.BlockSpec((NREG, cbc, ng), lambda i, l: (0, i, 0))
    col = pl.BlockSpec((cbc, ng), lambda i, l: (i, 0))

    up = pl.pallas_call(
        functools.partial(_lw_up_kernel, opts), grid=grid,
        in_specs=[rev9, rev9, rev3, rev3] + [rev_g] * 4
        + [revK(9), revK(9), revK(2)] + [col9, col3, col, col],
        out_specs=(rev9, rev3, rev_g, rev_g, col3, col),
        out_shape=(jax.ShapeDtypeStruct((nlev, _N2, ncol, ng), dt),
                   jax.ShapeDtypeStruct((nlev, NREG, ncol, ng), dt),
                   jax.ShapeDtypeStruct((nlev, ncol, ng), dt),
                   jax.ShapeDtypeStruct((nlev, ncol, ng), dt),
                   jax.ShapeDtypeStruct((NREG, ncol, ng), dt),
                   jax.ShapeDtypeStruct((ncol, ng), dt)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((_N2, cbc, ng), dt),
                        pltpu.VMEM((NREG, cbc, ng), dt),
                        pltpu.VMEM((cbc, ng), dt),
                        pltpu.VMEM((cbc, ng), dt)],
    )(Rs, Ts, SUs, SDs, *cl4, u9c, v9top, msk_up,
      alb0, src0, albc0, srcc0)
    albb, srcb, albcb, srccb, src_f, src_c_f = up

    dn = pl.pallas_call(
        _lw_dn_kernel, grid=grid,
        in_specs=[lev9, lev9, lev3, lev3] + [lev_g] * 4
        + [lev3, lev9, lev_g, lev_g] + [levK(9), levK(2)],
        out_specs=(lev_g,) * 4,
        out_shape=tuple(jax.ShapeDtypeStruct((nlev, ncol, ng), dt)
                        for _ in range(4)),
        compiler_params=_VMEM_LIMIT,
        scratch_shapes=[pltpu.VMEM((NREG, cbc, ng), dt),
                        pltpu.VMEM((cbc, ng), dt)],
    )(Rs, Ts, SUs, SDs, *cl4, srcb, albb, srccb, albcb, v9bot, msk_dn)

    return src_f, src_c_f, dn
