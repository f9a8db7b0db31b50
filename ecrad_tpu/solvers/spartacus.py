"""SPARTACUS solvers: 3D radiative transfer with matrix exponentials.

Reference: radiation/radiation_spartacus_sw.F90 (solver L41-965,
step_migrations L966-1046), radiation_spartacus_lw.F90 (solver L35-607),
radiation_lw_derivatives.F90:138-193 (calc_lw_derivatives_matrix).

TPU formulation: the reference's per-column/per-layer/per-g triple loop
with data-dependent ``ng3D`` cutoffs becomes dense batched compute over
(ncol, ng) with masks.  Per-layer reflectance/transmittance matrices
(including the 9x9 / 6x6 matrix exponentials) are computed by a
``lax.map`` over the level axis, keeping peak memory at one level of expm
intermediates; the upward albedo accumulation and downward flux sweep are
``lax.scan`` recurrences carrying (ncol, ng, nreg[, nreg]) states.  The
g-point ordering is assumed already reordered by increasing gas optical
depth (radiation_ifs_rrtm.F90:51-67), so the reference's prefix rule
``od(g) <= max_gas_od_3d for g < ng3D`` becomes a per-g mask.

Entrapment modes (Hogan et al. GMD 2019) are compile-time (config-static)
branches; the per-column clear-layer special cases are runtime masks.
Matrix convention: A[..., i, j] with i = destination region row, matching
the Fortran A(g, j1, j2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ecrad_tpu.config import Config, Entrapment, PdfShape
from ecrad_tpu.solvers import two_stream
from ecrad_tpu.solvers.matrix import (expm, fast_expm_exchange_3,
                                      mat_x_vec, solve_mat, solve_vec)
from ecrad_tpu.solvers.outputs import (LwFluxes, SwFluxes,
                                       lw_from_g_profiles,
                                       sw_from_g_profiles)
from ecrad_tpu.solvers.tripleclouds import (calc_region_properties,
                                            calc_overlap_matrices,
                                            _merge_regions)
from ecrad_tpu import profiling

# radiation_constants.F90:30-33
R_OVER_G = 287.058 / 9.80665
FOUR_OVER_PI = 4.0 / np.pi
TAN_DIFFUSE_ANGLE_3D = np.pi * 0.5          # radiation_spartacus_sw.F90:94
MIN_MU0_3D = 0.004625
SIDE_EMISS_THIN = 1.4107                    # radiation_spartacus_lw.F90:130
LW_DIFFUSIVITY = 1.66
NREG = 3
_EPS = float(np.finfo(np.float64).eps)


def _highest_precision(fn):
    """Trace the solver under full-precision matmuls: the 3x3..9x9
    exponentials and solves are numerically delicate, and the TPU default
    (bf16 inputs) turns near-singular systems into NaNs.  These matrices
    are tiny, so the cost is negligible."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


def _diag(v):
    """(..., m) -> (..., m, m) diagonal matrices."""
    return v[..., :, None] * jnp.eye(v.shape[-1], dtype=v.dtype)


def _diag_part(A):
    return jnp.diagonal(A, axis1=-2, axis2=-1)


def _embed00(x, like):
    """Scalar field -> matrix/vector with only the leading entry set."""
    z = jnp.zeros(like.shape, like.dtype)
    if like.ndim == x.ndim + 2:
        return z.at[..., 0, 0].set(x)
    return z.at[..., 0].set(x)


def _exchange(tr):
    """Conservative-exchange matrix from transfer rates:
    X[i,i] = sum_j tr[i,j]; X[i,j] = -tr[j,i]
    (the Gamma assembly pattern of radiation_spartacus_sw.F90:343-374)."""
    rowsum = jnp.sum(tr, axis=-1)
    return _diag(rowsum) - jnp.swapaxes(tr, -1, -2)


def _transfer_rates(reg_fracs, edge_length, dz, tan_angle, max_rate):
    """Transfer rates between regions (radiation_spartacus_sw.F90:259-296).

    reg_fracs/edge_length (..., 3), dz (...), tan_angle broadcastable.
    Returns (..., 3, 3) clamped at max_3d_transfer_rate."""
    f = reg_fracs

    def rate(el, fr):
        return jnp.where(fr > _EPS,
                         dz * el * tan_angle / jnp.maximum(fr, _EPS), 0.0)

    z = jnp.zeros_like(f[..., 0])
    row0 = jnp.stack([z, rate(edge_length[..., 0], f[..., 0]),
                      rate(edge_length[..., 2], f[..., 0])], -1)
    row1 = jnp.stack([rate(edge_length[..., 0], f[..., 1]), z,
                      rate(edge_length[..., 1], f[..., 1])], -1)
    row2 = jnp.stack([rate(edge_length[..., 2], f[..., 2]),
                      rate(edge_length[..., 1], f[..., 2]), z], -1)
    tr = jnp.stack([row0, row1, row2], -2)
    return jnp.minimum(tr, max_rate)


def _prep(config: Config, cloud_fraction, fractional_std, overlap_param,
          pressure_hl, temperature_hl, inv_cloud_size, inv_inhom_size):
    """Shared SPARTACUS geometry prep (radiation_spartacus_sw.F90:110-296)."""
    reg_fracs, od_scaling = calc_region_properties(
        cloud_fraction, fractional_std,
        config.cloud_pdf_shape == PdfShape.GAMMA,
        config.cloud_fraction_threshold,
        n_regions=config.nregions)
    u_mat, v_mat, cloud_cover = calc_overlap_matrices(
        reg_fracs, overlap_param, config.cloud_inhom_decorr_scaling,
        config.cloud_fraction_threshold)
    clear_layer = cloud_fraction <= 0.0

    phl, thl = pressure_hl, temperature_hl
    layer_depth = R_OVER_G * (phl[:, 1:] - phl[:, :-1]) \
        * (thl[:, :-1] + thl[:, 1:]) / (phl[:, :-1] + phl[:, 1:])

    max_inv_size = 1.0 / config.min_cloud_effective_size
    inv_size = jnp.minimum(inv_cloud_size, max_inv_size)
    if inv_inhom_size is None:
        inv_inhom = inv_size
    else:
        inv_inhom = jnp.minimum(inv_inhom_size, max_inv_size)

    active_3d = (config.do_3d_effects & ~clear_layer
                 & (inv_cloud_size > 0.0))
    f0 = reg_fracs[..., 0]
    f2 = reg_fracs[..., 2]
    el0 = FOUR_OVER_PI * f0 * (1.0 - f0) * inv_size
    el1 = FOUR_OVER_PI * f2 * (1.0 - f2) * inv_inhom
    if config.clear_to_thick_fraction > 0.0:
        el2 = config.clear_to_thick_fraction * jnp.minimum(el0, el1)
        el0 = el0 - el2
        el1 = el1 - el2
    else:
        el2 = jnp.zeros_like(el0)
    edge_length = jnp.where(active_3d[..., None],
                            jnp.stack([el0, el1, el2], -1), 0.0)

    return dict(reg_fracs=reg_fracs, od_scaling=od_scaling, u_mat=u_mat,
                v_mat=v_mat, cloud_cover=cloud_cover,
                clear_layer=clear_layer, layer_depth=layer_depth,
                edge_length=edge_length, active_3d=active_3d,
                inv_size=inv_size)


def _region_optics(config: Config, od, ssa, g, od_cloud_b, ssa_cloud_b,
                   g_cloud_b, band_from_g, od_scaling):
    """Per-region od/ssa/g, region axis LAST: (ncol, nlev, ng, 3).

    Follows radiation_spartacus_sw.F90:297-320: ssa/g from unclamped od,
    then od clamped at max_cloud_od."""
    od_c, ssa_c, g_c = _merge_regions(od, ssa, g, od_cloud_b, ssa_cloud_b,
                                      g_cloud_b, band_from_g, od_scaling)
    # (ncol, nlev, 2, ng) -> (ncol, nlev, ng, 2)
    od_c = jnp.moveaxis(od_c, -2, -1)
    ssa_c = jnp.moveaxis(ssa_c, -2, -1)
    g_c = jnp.moveaxis(g_c, -2, -1)
    od_c = jnp.minimum(od_c, config.max_cloud_od)
    od3 = jnp.concatenate([od[..., None], od_c], -1)
    ssa3 = jnp.concatenate([ssa[..., None], ssa_c], -1)
    g3 = jnp.concatenate([g[..., None], g_c], -1)
    return od3, ssa3, g3


def _use_expm_mask(config: Config, od_gas, active_3d):
    """Per-g expm mask implementing the ng3D prefix rule
    (radiation_spartacus_sw.F90:208-216, 326-330).  od_gas (ncol,nlev,ng)
    is the (reordered) clear-sky od; returns bool (ncol, nlev, ng)."""
    exceeds = od_gas > config.max_gas_od_3d
    any_exceeds = jnp.any(exceeds, axis=-1)
    first = jnp.argmax(exceeds, axis=-1)
    ng = od_gas.shape[-1]
    ng3d = jnp.where(any_exceeds, first, ng)
    prefix = jnp.arange(ng) < ng3d[..., None]
    if config.use_expm_everywhere:
        layer_on = jnp.ones_like(active_3d)
    else:
        layer_on = active_3d
    return prefix & layer_on[..., None]


def _use_plane_layer_mats() -> bool:
    """Opt-in (ECRAD_TPU_SPARTACUS_PLANES=1): plane-form layer-matrix
    algebra on accelerators.  Round-4 status: it cuts the device RUN
    time of the layer-matrix phase ~3.4x (the (..,3,3)/(..,6,6) arrays'
    minor-dim tile padding is what makes the array form run ~200x above
    its memory roofline — see matrix.py plane-algebra notes and the
    BASELINE.md SPARTACUS section), but the unrolled plane HLO blows
    XLA compile time to minutes-per-solver, so it is not yet the
    default.  Round-5 direction: fori-loop the Pade powers the way the
    squaring chain already is, shrinking the body enough to flip the
    default."""
    import os
    return os.environ.get("ECRAD_TPU_SPARTACUS_PLANES", "0") \
        not in ("", "0")


def _map_levels(fn, xs, nlev, chunk=4):
    """lax.map over CHUNKS of levels instead of single levels.

    The per-level matrix builder (expm + LU solves) is dominated by
    sequential-dispatch overhead when run 137 times back to back; with
    16 levels vmapped per map step the expensive ops batch 16x and only
    ~9 sequential rounds remain, while the (chunk, ncol, ng, 6, 6)
    temporaries stay bounded (vs batching all levels at once)."""
    nchunk = -(-nlev // chunk)
    pad = nchunk * chunk - nlev

    def prep(x):
        if pad:
            x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, 0)], 0)
        return x.reshape((nchunk, chunk) + x.shape[1:])

    xs = jax.tree_util.tree_map(prep, xs)
    # fn bodies are written for arbitrary leading batch dims (plane
    # form), so the chunk axis rides along as a plain batch dim
    out = jax.lax.map(fn, xs)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((nchunk * chunk,) + x.shape[2:])[:nlev], out)


def _zero_clear(mats, clear):
    """Zero all but the [0,0] entry of per-layer matrices in clear layers
    (radiation_spartacus_sw.F90:407-420 leaves only the clear-sky region).

    Uses a select, not a 0/1 multiply: the masked entries can be NaN
    (degenerate expm/solve on all-zero cloudy regions) and NaN*0 = NaN
    would leak into consumers that reduce over all entries (the LW
    derivative sweep) even though the flux sweeps never read them."""
    keep = jnp.zeros((NREG, NREG), bool).at[0, 0].set(True)
    m = clear[:, None, None, None]
    return [jnp.where(m & ~keep, jnp.zeros((), A.dtype), A)
            for A in mats]


# ---------------------------------------------------------------------------
# Shortwave
# ---------------------------------------------------------------------------

@_highest_precision
@profiling.traced("radiation_spartacus_sw:solver_spartacus_sw")
def solver_spartacus_sw(config: Config, od, ssa, g, od_cloud_b,
                        ssa_cloud_b, g_cloud_b, band_from_g,
                        cloud_fraction, fractional_std, overlap_param,
                        inv_cloud_size, inv_inhom_size,
                        pressure_hl, temperature_hl,
                        incoming_sw, cos_sza, albedo_diffuse,
                        albedo_direct, spec_matrix=None) -> SwFluxes:
    """radiation_spartacus_sw.F90:41-965.  All g-dependent inputs must be
    in SPARTACUS (reordered) g order; band_from_g is the reordered map."""
    ncol, nlev, ng = od.shape
    dtype = od.dtype
    P = _prep(config, cloud_fraction, fractional_std, overlap_param,
              pressure_hl, temperature_hl, inv_cloud_size, inv_inhom_size)
    reg_fracs, u_mat, v_mat = P["reg_fracs"], P["u_mat"], P["v_mat"]
    clear_layer, edge_length = P["clear_layer"], P["edge_length"]

    # Night columns are masked at the end (the reference cycles them);
    # use mu0=1 there so the 1/mu0 Gamma entries keep expm norms small.
    day_mask = cos_sza >= 1.0e-10
    mu0 = jnp.where(day_mask, jnp.maximum(cos_sza, 1.0e-10), 1.0)
    one_over_mu0 = 1.0 / mu0
    # radiation_spartacus_sw.F90:168-176
    tan_sza = jnp.where(
        mu0 < MIN_MU0_3D,
        jnp.sqrt(1.0 / MIN_MU0_3D ** 2 - 1.0),
        jnp.where(one_over_mu0 > 1.0,
                  jnp.sqrt(jnp.maximum(one_over_mu0 ** 2 - 1.0, 0.0)
                           + config.overhead_sun_factor),
                  jnp.sqrt(config.overhead_sun_factor)))

    od3, ssa3, g3 = _region_optics(config, od, ssa, g, od_cloud_b,
                                   ssa_cloud_b, g_cloud_b, band_from_g,
                                   P["od_scaling"])
    use_expm = _use_expm_mask(config, od, P["active_3d"])
    any_expm = config.do_3d_effects or config.use_expm_everywhere

    tr_diff = _transfer_rates(reg_fracs, edge_length, P["layer_depth"],
                              TAN_DIFFUSE_ANGLE_3D,
                              config.max_3d_transfer_rate)
    tr_dir = _transfer_rates(reg_fracs, edge_length, P["layer_depth"],
                             tan_sza[:, None],
                             config.max_3d_transfer_rate)

    mu0b = mu0[:, None, None]
    eye3 = jnp.eye(NREG, dtype=dtype)

    def layer_mats_planes(xs):
        """Plane-form SW layer matrices (see the LW twin and matrix.py
        plane-algebra rationale); handles any leading batch dims."""
        od3l, ssa3l, g3l, trd, trdir, uem, clr = xs
        from ecrad_tpu.solvers.matrix import (pl_expm, pl_matmul,
                                              pl_solve_mat, planes_to)
        mu0p = mu0[:, None]                       # (ncol, 1)
        inv_mu0p = one_over_mu0[:, None]
        odr = [od3l[..., r] for r in range(NREG)]
        ssar = [ssa3l[..., r] for r in range(NREG)]
        gr = [g3l[..., r] for r in range(NREG)]
        zero = jnp.zeros_like(odr[0])
        r_p, t_p, rd_p, tdd_p, tdir_p = [], [], [], [], []
        g1r, g2r, g3r = [], [], []
        for r in range(NREG):
            g1, g2, g3_ = two_stream.sw_gammas(mu0p, ssar[r], gr[r])
            g1r.append(g1)
            g2r.append(g2)
            g3r.append(g3_)
            rr, tt, rd, tdd, tdir = two_stream.sw_ref_trans(
                mu0p, odr[r], ssar[r], gr[r])
            r_p.append(rr)
            t_p.append(tt)
            rd_p.append(rd)
            tdd_p.append(tdd)
            tdir_p.append(tdir)

        def diagm(v):
            return [[v[i] if i == j else zero for j in range(NREG)]
                    for i in range(NREG)]

        Rp, Tp = diagm(r_p), diagm(t_p)
        Rdp, Tddp, Tdirp = diagm(rd_p), diagm(tdd_p), diagm(tdir_p)
        if any_expm:
            # Gamma assembly (radiation_spartacus_sw.F90:327-380);
            # transfer rates are per-column: broadcast (.., ncol, 1)
            def exch(trm):
                t = [[trm[..., i, j][..., None] for j in range(NREG)]
                     for i in range(NREG)]
                return [[(sum(t[i][k] for k in range(NREG))
                          if i == j else -t[j][i])
                         for j in range(NREG)] for i in range(NREG)]

            Xd = exch(trd)
            Xdir = exch(trdir)
            n2, n3 = 2 * NREG, 3 * NREG
            G = [[zero] * n3 for _ in range(n3)]
            for i in range(NREG):
                for j in range(NREG):
                    Dij = (odr[i] * g1r[i] if i == j else zero) + Xd[i][j]
                    G[i][j] = Dij
                    G[NREG + i][NREG + j] = -Dij
                    Sij = -Xdir[i][j] + (
                        -odr[i] * inv_mu0p if i == j else zero)
                    G[n2 + i][n2 + j] = Sij
                G[i][NREG + i] = -odr[i] * g2r[i]
                G[NREG + i][i] = odr[i] * g2r[i]
                G[i][n2 + i] = -odr[i] * ssar[i] * g3r[i]
                G[NREG + i][n2 + i] = odr[i] * ssar[i] * (1.0 - g3r[i])
            E = pl_expm(G)
            E11 = [row[0:NREG] for row in E[0:NREG]]
            E12 = [row[NREG:n2] for row in E[0:NREG]]
            E13 = [row[n2:] for row in E[0:NREG]]
            E21 = [row[0:NREG] for row in E[NREG:n2]]
            E22 = [row[NREG:n2] for row in E[NREG:n2]]
            E23 = [row[n2:] for row in E[NREG:n2]]
            tdir_e = [[jnp.clip(E[n2 + i][n2 + j], 0.0, 1.0)
                       for j in range(NREG)] for i in range(NREG)]
            sm12 = pl_solve_mat(E11, E12)
            refl_e = [[jnp.clip(-sm12[i][j], 0.0, 1.0)
                       for j in range(NREG)] for i in range(NREG)]
            tr21 = pl_matmul(E21, refl_e)
            trans_e = [[jnp.clip(tr21[i][j] + E22[i][j], 0.0, 1.0)
                        for j in range(NREG)] for i in range(NREG)]
            sm13 = pl_solve_mat(E11, E13)
            rdir_e = [[jnp.clip(-sm13[i][j], 0.0, mu0p)
                       for j in range(NREG)] for i in range(NREG)]
            td21 = pl_matmul(E21, rdir_e)
            tdd_e = [[jnp.clip(td21[i][j] + E23[i][j], 0.0, mu0p)
                      for j in range(NREG)] for i in range(NREG)]
            for i in range(NREG):
                for j in range(NREG):
                    Rp[i][j] = jnp.where(uem, refl_e[i][j], Rp[i][j])
                    Tp[i][j] = jnp.where(uem, trans_e[i][j], Tp[i][j])
                    Rdp[i][j] = jnp.where(uem, rdir_e[i][j], Rdp[i][j])
                    Tddp[i][j] = jnp.where(uem, tdd_e[i][j], Tddp[i][j])
                    Tdirp[i][j] = jnp.where(uem, tdir_e[i][j],
                                            Tdirp[i][j])
        # clear layers keep only [0,0] (select — see _zero_clear note)
        clrb = clr[..., None]
        z0 = jnp.zeros((), dtype)
        for M in (Rp, Tp, Rdp, Tddp, Tdirp):
            for i in range(NREG):
                for j in range(NREG):
                    if i == 0 and j == 0:
                        continue
                    M[i][j] = jnp.where(clrb, z0, M[i][j])
        return (planes_to(Rp), planes_to(Tp), planes_to(Rdp),
                planes_to(Tddp), planes_to(Tdirp))

    def layer_mats_array(xs):
        od3l, ssa3l, g3l, trd, trdir, uem, clr = xs
        g1, g2, g3_ = two_stream.sw_gammas(mu0b, ssa3l, g3l)
        r_mw, t_mw, rd_mw, tdd_mw, tdir_mw = two_stream.sw_ref_trans(
            mu0b, od3l, ssa3l, g3l)
        R = _diag(r_mw)
        T = _diag(t_mw)
        Rd = _diag(rd_mw)
        Tdd = _diag(tdd_mw)
        Tdir = _diag(tdir_mw)
        if any_expm:
            # Gamma assembly (radiation_spartacus_sw.F90:327-380)
            D = _diag(od3l * g1) + _exchange(trd)[:, None]
            G2 = _diag(od3l * g2)
            C1 = _diag(-od3l * ssa3l * g3_)
            C2 = _diag(od3l * ssa3l * (1.0 - g3_))
            S = _diag(-od3l * one_over_mu0[:, None, None]) \
                - _exchange(trdir)[:, None]
            Z = jnp.zeros_like(D)
            G = jnp.concatenate([
                jnp.concatenate([D, -G2, C1], -1),
                jnp.concatenate([G2, -D, C2], -1),
                jnp.concatenate([Z, Z, S], -1)], -2)
            E = expm(G)
            E11 = E[..., 0:3, 0:3]
            E12 = E[..., 0:3, 3:6]
            E13 = E[..., 0:3, 6:9]
            E21 = E[..., 3:6, 0:3]
            E22 = E[..., 3:6, 3:6]
            E23 = E[..., 3:6, 6:9]
            mu0m = mu0[:, None, None, None]
            tdir_e = jnp.clip(E[..., 6:9, 6:9], 0.0, 1.0)
            refl_e = jnp.clip(-solve_mat(E11, E12), 0.0, 1.0)
            trans_e = jnp.clip(E21 @ refl_e + E22, 0.0, 1.0)
            rdir_e = jnp.clip(-solve_mat(E11, E13), 0.0, mu0m)
            tdd_e = jnp.clip(E21 @ rdir_e + E23, 0.0, mu0m)
            m = uem[..., None, None]
            R = jnp.where(m, refl_e, R)
            T = jnp.where(m, trans_e, T)
            Rd = jnp.where(m, rdir_e, Rd)
            Tdd = jnp.where(m, tdd_e, Tdd)
            Tdir = jnp.where(m, tdir_e, Tdir)
        R, T, Rd, Tdd, Tdir = _zero_clear([R, T, Rd, Tdd, Tdir], clr)
        return R, T, Rd, Tdd, Tdir

    # plane form on accelerators (padding-free tiny-matrix algebra,
    # see matrix.py); array form per level on CPU, where XLA compiles
    # dots fast and the f64 goldens ran historically
    lev = lambda a: jnp.moveaxis(a, 1, 0)
    xs_mats = (lev(od3), lev(ssa3), lev(g3), lev(tr_diff), lev(tr_dir),
               lev(use_expm), lev(clear_layer))
    if _use_plane_layer_mats():
        Rs, Ts, Rds, Tdds, Tdirs = _map_levels(layer_mats_planes,
                                               xs_mats, nlev)
    else:
        Rs, Ts, Rds, Tdds, Tdirs = jax.lax.map(layer_mats_array, xs_mats)

    # clear-sky scalar layer properties
    r_cl, t_cl, rd_cl, tdd_cl, tdir_cl = two_stream.sw_ref_trans(
        mu0[:, None, None], od, ssa, g)

    clear_pad = jnp.concatenate(
        [jnp.ones((ncol, 1), bool), clear_layer,
         jnp.ones((ncol, 1), bool)], axis=1)  # layer index -1..nlev
    # condition "jlev >= i_cloud_top": a cloudy layer exists at or above
    at_or_below_cloud_top = jnp.cumsum(~clear_layer, axis=1) > 0

    mode = config.sw_entrapment
    explicit = mode in (Entrapment.EXPLICIT, Entrapment.EXPLICIT_NON_FRACTAL)

    # per-level views of "layer above" (index ell-1) quantities
    pad0 = lambda a: jnp.concatenate([jnp.zeros_like(a[:, :1]), a], axis=1)
    el_above = pad0(edge_length)[:, :-1]
    rf_above = pad0(reg_fracs)[:, :-1]
    inv_size_above = pad0(P["inv_size"])[:, :-1]
    # overlap_param between layer ell-1 and ell (zero-padded at ell=0)
    op_above = jnp.concatenate(
        [jnp.zeros((ncol, 1), dtype), overlap_param], axis=1)
    not_top = jnp.arange(nlev) > 0                # "jlev > 1"

    x_lay_dif_all = P["layer_depth"] * (TAN_DIFFUSE_ANGLE_3D / np.sqrt(2.0))
    x_lay_dir_all = P["layer_depth"] * 0.5 * jnp.sqrt(
        tan_sza[:, None] ** 2 + TAN_DIFFUSE_ANGLE_3D ** 2)

    def up_step(carry, xs):
        alb, albd, alb_c, albd_c, xdif, xdir = carry
        (R, T, Rd, Tdd, Tdir, rcl, tcl, rdcl, tddcl, tdircl, u, v,
         clr, clr_above, migrate, rf, elp, rfp, invszp, opp, ntop,
         xld, xldir) = xs
        out_albs = (alb, albd, alb_c, albd_c)

        # clear-sky scalar adding (radiation_spartacus_sw.F90:444-456)
        inv_d = 1.0 / (1.0 - alb_c * rcl)
        alb_c_new = rcl + tcl * tcl * alb_c * inv_d
        albd_c_new = rdcl + (tdircl * albd_c + tddcl * alb_c) * tcl * inv_d

        # layer adding: full matrix (radiation_spartacus_sw.F90:474-494)
        denom = eye3 - alb @ R
        X = R + T @ solve_mat(denom, alb @ T)
        Xd = Rd + T @ solve_mat(denom, albd @ Tdir + alb @ Tdd)
        # clear-layer scalar version (L458-473), region (0,0) only
        a00, ad00 = alb[..., 0, 0], albd[..., 0, 0]
        R00, T00 = R[..., 0, 0], T[..., 0, 0]
        inv_s = 1.0 / (1.0 - a00 * R00)
        s00 = R00 + T00 * T00 * a00 * inv_s
        sd00 = Rd[..., 0, 0] + (Tdir[..., 0, 0] * ad00
                                + Tdd[..., 0, 0] * a00) * T00 * inv_s
        cm = clr[:, None, None, None]
        X = jnp.where(cm, _embed00(s00, X), X)
        Xd = jnp.where(cm, _embed00(sd00, Xd), Xd)

        # --- step_migrations (radiation_spartacus_sw.F90:966-1046)
        if explicit:
            cf = 1.0 - rf[..., 0]
            Rdg, Tdg = _diag_part(R), _diag_part(T)
            Rddg, Tddg, Tdirg = (_diag_part(Rd), _diag_part(Tdd),
                                 _diag_part(Tdir))
            Adg, Addg = _diag_part(alb), _diag_part(albd)
            xldb = xld[:, None, None]
            xldirb = xldir[:, None, None]
            ms = Tdg / (1.0 - Rdg * Adg)
            xe = (1.0 - Rdg * Adg) ** (-1.5)
            top_alb_dir = jnp.maximum(
                1.0e-8, Rddg + ms * (Tddg * Adg + Tdirg * Addg))
            xdir_new = jnp.maximum(0.0, xldirb + (
                (Tddg * Adg * xe + Tdirg * Addg * (xe - 1.0))
                * (xdif + xldb)
                + Tdirg * Addg * (xdir + xldirb)) * Tdg / top_alb_dir)
            top_alb = jnp.maximum(1.0e-8, Rdg + ms * Tdg * Adg)
            xdif_new = xldb + xe * Adg * Tdg * Tdg * (xdif + xldb) / top_alb
            active_r = jnp.stack([cf < 1.0, cf > 0.0, cf > 0.0], -1)
            xdir_new = jnp.where(active_r[:, None, :], xdir_new, 0.0)
            xdif_new = jnp.where(active_r[:, None, :], xdif_new, 0.0)
            mm = migrate[:, None, None]
            xdif = jnp.where(mm, xdif_new, xdif)
            xdir = jnp.where(mm, xdir_new, xdir)

        # --- overlap / entrapment mixing (radiation_spartacus_sw.F90:510-760)
        full = lambda A: jnp.einsum("cij,cgjk,ckl->cgil", u, A, v)
        copy00 = lambda A: _embed00(A[..., 0, 0], A)
        both_clear = (clr & clr_above)[:, None, None, None]
        above_clear = clr_above[:, None, None, None]

        if mode == Entrapment.MAXIMUM:
            alb_new, albd_new = full(X), full(Xd)
        elif mode == Entrapment.ZERO:
            def zero_mix(A):
                colsum = jnp.sum(A, axis=-2)                 # (c, g, 3)
                return _diag(jnp.einsum("cgj,cji->cgi", colsum, v))
            alb_new = jnp.where(above_clear, full(X), zero_mix(X))
            albd_new = jnp.where(above_clear, full(Xd), zero_mix(Xd))
        else:
            offd = lambda A: A * (1.0 - eye3)
            base, based = full(offd(X)), full(offd(Xd))
            if mode == Entrapment.EDGE_ONLY or not config.do_3d_effects:
                def dmix(A):
                    return _diag(jnp.einsum(
                        "cgj,cji->cgi", _diag_part(A), v))
                alb_new = base + dmix(X)
                albd_new = based + dmix(Xd)
            else:
                # Explicit entrapment (radiation_spartacus_sw.F90:586-760)
                acc = jnp.zeros_like(X)
                accd = jnp.zeros_like(Xd)
                for j2 in range(NREG):
                    ts = 1.0 - (1.0 - config.overhang_factor) * opp \
                        * jnp.minimum(rf[..., j2], rfp[..., j2]) \
                        / jnp.maximum(config.cloud_fraction_threshold,
                                      rf[..., j2])
                    ts = jnp.where(ntop, ts, 0.0)

                    def trd_entry(el_e, iup):
                        return ts * el_e \
                            / jnp.maximum(u[..., iup, j2], 1.0e-5)
                    tr01 = trd_entry(elp[..., 0], 0)
                    tr10 = trd_entry(elp[..., 0], 1)
                    tr12 = trd_entry(elp[..., 1], 1)
                    tr21 = trd_entry(elp[..., 1], 2)

                    def entrap(xmig):
                        xj = xmig[..., j2]                    # (ncol, ng)
                        if mode == Entrapment.EXPLICIT:
                            ff = 1.0 / jnp.sqrt(jnp.maximum(
                                1.0, 2.5 * xj * invszp[:, None]))
                        else:
                            ff = 1.0
                        e10 = tr01[:, None] * xj * ff
                        e01 = tr10[:, None] * xj * ff
                        e21 = tr12[:, None] * xj * ff
                        e12 = tr21[:, None] * xj * ff
                        e00 = -e10
                        e11 = -e01 - e21
                        max_entr = -jnp.minimum(e00, e11)
                        scale = jnp.where(
                            max_entr > config.max_cloud_od,
                            config.max_cloud_od
                            / jnp.maximum(max_entr, 1e-300), 1.0)
                        return (e10 * scale, e01 * scale, e21 * scale,
                                e12 * scale)

                    vx = v[:, None, None, j2, :]             # v(j2, jreg)
                    Pm = fast_expm_exchange_3(*entrap(xdif))
                    acc = acc + Pm * vx \
                        * X[..., j2, j2][..., None, None]
                    Pmd = fast_expm_exchange_3(*entrap(xdir))
                    accd = accd + Pmd * vx \
                        * Xd[..., j2, j2][..., None, None]
                alb_new = base + acc
                albd_new = based + accd
            alb_new = jnp.where(above_clear, full(X), alb_new)
            albd_new = jnp.where(above_clear, full(Xd), albd_new)
        alb_new = jnp.where(both_clear, copy00(X), alb_new)
        albd_new = jnp.where(both_clear, copy00(Xd), albd_new)

        # migrate x through the interface (radiation_spartacus_sw.F90:758-777)
        if explicit:
            active_j2 = jnp.stack(
                [jnp.ones_like(clr), ~clr, ~clr], -1)        # (ncol, 3)
            xm = lambda x: jnp.einsum(
                "cgj,cji->cgi", x * active_j2[:, None, :], v)
            nskip = ~(clr & clr_above)[:, None, None]
            xdif = jnp.where(nskip, xm(xdif), xdif)
            xdir = jnp.where(nskip, xm(xdir), xdir)

        return (alb_new, albd_new, alb_c_new, albd_c_new, xdif, xdir), \
            out_albs

    alb0 = _diag(jnp.broadcast_to(albedo_diffuse[:, :, None],
                                  (ncol, ng, NREG)))
    albd0 = _diag(jnp.broadcast_to(
        (mu0[:, None] * albedo_direct)[:, :, None], (ncol, ng, NREG)))
    xz = jnp.zeros((ncol, ng, NREG), dtype)
    carry0 = (alb0, albd0,
              jnp.broadcast_to(albedo_diffuse, (ncol, ng)),
              mu0[:, None] * albedo_direct, xz, xz)

    xs_up = (Rs, Ts, Rds, Tdds, Tdirs,
             lev(r_cl), lev(t_cl), lev(rd_cl), lev(tdd_cl), lev(tdir_cl),
             lev(u_mat[:, :-1]), lev(v_mat[:, :-1]),
             lev(clear_layer), lev(clear_pad[:, :-2]),
             lev(at_or_below_cloud_top), lev(reg_fracs),
             lev(el_above), lev(rf_above), lev(inv_size_above),
             lev(op_above),
             jnp.broadcast_to(not_top[:, None], (nlev, ncol)),
             lev(x_lay_dif_all), lev(x_lay_dir_all))

    (alb_f, albd_f, alb_c_f, albd_c_f, _, _), \
        (alb_s, albd_s, alb_c_s, albd_c_s) = jax.lax.scan(
            up_step, carry0, xs_up, reverse=True)

    # ---- downward pass (radiation_spartacus_sw.F90:779-957)
    ddn0 = incoming_sw[:, :, None] * reg_fracs[:, 0, None, :]
    fup_toa = mat_x_vec(albd_f, ddn0)
    fup_toa_c = incoming_sw * albd_c_f

    def dn_step(carry, xs):
        fdn, ddn, fdn_c, ddn_c = carry
        (R, T, Rd, Tdd, Tdir, rcl, tcl, rdcl, tddcl, tdircl,
         alb_n, albd_n, alb_cn, albd_cn, v_below, clr, clr_below) = xs
        src = mat_x_vec(Tdd, ddn)
        ddn_above = mat_x_vec(Tdir, ddn)
        # clear-sky scalars
        src_c = tddcl * ddn_c
        ddn_c2 = tdircl * ddn_c
        fdn_c2 = (tcl * fdn_c + rcl * albd_cn * ddn_c2 + src_c) \
            / (1.0 - rcl * alb_cn)
        fup_c = albd_cn * ddn_c2 + alb_cn * fdn_c2
        # matrix branch
        denom = eye3 - R @ alb_n
        tsrc = mat_x_vec(albd_n, ddn_above)
        fdn_above = solve_vec(denom, mat_x_vec(T, fdn)
                              + mat_x_vec(R, tsrc) + src)
        fup_above = mat_x_vec(alb_n, fdn_above) + tsrc
        # clear-layer scalar branch, region 0
        f0 = (T[..., 0, 0] * fdn[..., 0]
              + R[..., 0, 0] * albd_n[..., 0, 0] * ddn_above[..., 0]
              + src[..., 0]) / (1.0 - R[..., 0, 0] * alb_n[..., 0, 0])
        u0 = albd_n[..., 0, 0] * ddn_above[..., 0] \
            + alb_n[..., 0, 0] * f0
        cm = clr[:, None, None]
        fdn_above = jnp.where(cm, _embed00(f0, fdn_above), fdn_above)
        fup_above = jnp.where(cm, _embed00(u0, fup_above), fup_above)
        # through the interface below
        skip = (clr & clr_below)[:, None, None]
        mix = lambda a: jnp.einsum("cij,cgj->cgi", v_below, a)
        fdn_next = jnp.where(skip, fdn_above, mix(fdn_above))
        ddn_next = jnp.where(skip, ddn_above, mix(ddn_above))
        return (fdn_next, ddn_next, fdn_c2, ddn_c2), \
            (fup_above, fdn_above, ddn_above, fup_c, fdn_c2, ddn_c2)

    carry_dn0 = (jnp.zeros_like(ddn0), ddn0,
                 jnp.zeros_like(incoming_sw), incoming_sw)
    xs_dn = (Rs, Ts, Rds, Tdds, Tdirs,
             lev(r_cl), lev(t_cl), lev(rd_cl), lev(tdd_cl), lev(tdir_cl),
             alb_s, albd_s, alb_c_s, albd_c_s,
             lev(v_mat[:, 1:]), lev(clear_layer), lev(clear_pad[:, 2:]))
    _, (fup_l, fdn_l, fdir_l, fup_cl, fdn_cl, fdir_cl) = jax.lax.scan(
        dn_step, carry_dn0, xs_dn)

    tolev = lambda a: jnp.moveaxis(a, 0, 1)
    # half-level (ncol, nlev+1, ng) profiles, regions summed
    fup_g = jnp.concatenate([jnp.sum(fup_toa, -1)[:, None],
                             jnp.sum(tolev(fup_l), -1)], 1)
    fdn_diff_g = jnp.concatenate([jnp.zeros((ncol, 1, ng), dtype),
                                  jnp.sum(tolev(fdn_l), -1)], 1)
    fdir_g = jnp.concatenate([incoming_sw[:, None],
                              jnp.sum(tolev(fdir_l), -1)], 1)
    fup_c_g = jnp.concatenate([fup_toa_c[:, None], tolev(fup_cl)], 1)
    fdn_c_g = jnp.concatenate([jnp.zeros((ncol, 1, ng), dtype),
                               tolev(fdn_cl)], 1)
    fdir_c_g = jnp.concatenate([incoming_sw[:, None], tolev(fdir_cl)], 1)

    mu0c = cos_sza[:, None, None]
    fdir_g = jnp.maximum(mu0c, 0.0) * fdir_g
    fdir_c_g = jnp.maximum(mu0c, 0.0) * fdir_c_g

    day = cos_sza >= 1.0e-10
    zn = lambda a: jnp.where(day[:, None, None], a, 0.0)
    fup_g, fdn_diff_g, fdir_g = zn(fup_g), zn(fdn_diff_g), zn(fdir_g)
    fup_c_g, fdn_c_g, fdir_c_g = zn(fup_c_g), zn(fdn_c_g), zn(fdir_c_g)

    return sw_from_g_profiles(
        flux_up_g=fup_g, flux_dn_diffuse_g=fdn_diff_g,
        flux_dn_direct_g=fdir_g,
        flux_up_clear_g=fup_c_g, flux_dn_diffuse_clear_g=fdn_c_g,
        flux_dn_direct_clear_g=fdir_c_g,
        cloud_cover=P["cloud_cover"], spec_matrix=spec_matrix)


# ---------------------------------------------------------------------------
# Longwave
# ---------------------------------------------------------------------------

@_highest_precision
@profiling.traced("radiation_spartacus_lw:solver_spartacus_lw")
def solver_spartacus_lw(config: Config, od, ssa, g, od_cloud_b,
                        ssa_cloud_b, g_cloud_b, band_from_g,
                        cloud_fraction, fractional_std, overlap_param,
                        inv_cloud_size, inv_inhom_size,
                        pressure_hl, temperature_hl,
                        planck_hl, emission, albedo,
                        spec_matrix=None) -> LwFluxes:
    """radiation_spartacus_lw.F90:35-607.  g-dependent inputs reordered."""
    ncol, nlev, ng = od.shape
    dtype = od.dtype
    P = _prep(config, cloud_fraction, fractional_std, overlap_param,
              pressure_hl, temperature_hl, inv_cloud_size, inv_inhom_size)
    reg_fracs, u_mat, v_mat = P["reg_fracs"], P["u_mat"], P["v_mat"]
    clear_layer, edge_length = P["clear_layer"], P["edge_length"]

    if not config.do_lw_aerosol_scattering:
        ssa = jnp.zeros_like(od)
        g = jnp.zeros_like(od)
    if config.do_lw_cloud_scattering:
        od3, ssa3, g3 = _region_optics(config, od, ssa, g, od_cloud_b,
                                       ssa_cloud_b, g_cloud_b, band_from_g,
                                       P["od_scaling"])
    else:
        zb = jnp.zeros_like(od_cloud_b)
        od3, ssa3, g3 = _region_optics(config, od, ssa, g, od_cloud_b,
                                       zb, zb, band_from_g,
                                       P["od_scaling"])
    use_expm = _use_expm_mask(config, od, P["active_3d"])
    any_expm = config.do_3d_effects or config.use_expm_everywhere

    tr = _transfer_rates(reg_fracs, edge_length, P["layer_depth"],
                         TAN_DIFFUSE_ANGLE_3D, config.max_3d_transfer_rate)

    # side emissivity (radiation_spartacus_lw.F90:289-310)
    f0 = reg_fracs[..., 0]
    f1 = reg_fracs[..., 1]
    if config.do_lw_side_emissivity and config.do_3d_effects:
        aspect = 1.0 / jnp.maximum(
            P["inv_size"] * f0 * P["layer_depth"], 1e-30)
        lateral_od = (aspect[..., None] / (NREG - 1.0)) * jnp.sum(
            od3[..., 1:] * (1.0 - ssa3[..., 1:]), -1)
        sq1 = jnp.sqrt(jnp.maximum(1.0 - ssa3[..., 1], 0.0))
        thick = 2.0 * sq1 / (sq1 + jnp.sqrt(
            jnp.maximum(1.0 - ssa3[..., 1] * g3[..., 1], 0.0)))
        side = (SIDE_EMISS_THIN - thick) / (lateral_od + 1.0) + thick
        cond = ((f0 > 0.0) & (f1 > 0.0)
                & (P["inv_size"] > 0.0))[..., None]
        side_emiss = jnp.where(cond, side, 1.0)
    else:
        side_emiss = jnp.ones_like(od3[..., 0])

    pl_top = planck_hl[:, :-1]                   # (ncol, nlev, ng)
    pl_bot = planck_hl[:, 1:]
    eye3 = jnp.eye(NREG, dtype=dtype)

    def layer_mats_planes(xs):
        """Plane-form layer matrices (see matrix.py plane algebra
        rationale): every quantity is a (batch..., ncol, ng) plane, so
        the 3x3/6x6 algebra never touches padded minor-dim tiles.
        Works for any leading batch dims (called on level chunks)."""
        od3l, ssa3l, g3l, trl, sidel, rf, clr, plt, plb, uem = xs
        from ecrad_tpu.solvers.matrix import (pl_expm, pl_matmul,
                                              pl_matvec, pl_solve_mat,
                                              pl_solve_vec)
        odr = [od3l[..., r] for r in range(NREG)]
        ssar = [ssa3l[..., r] for r in range(NREG)]
        gr = [g3l[..., r] for r in range(NREG)]
        rfr = [rf[..., r][..., None] for r in range(NREG)]
        zero = jnp.zeros_like(odr[0])
        r_p, t_p, su_p, sd_p, g1r, g2r = [], [], [], [], [], []
        for r in range(NREG):
            g1, g2 = two_stream.lw_gammas(ssar[r], gr[r])
            g1r.append(g1)
            g2r.append(g2)
            rr, tt, su, sd = two_stream.lw_ref_trans(
                odr[r], ssar[r], gr[r], rfr[r] * plt, rfr[r] * plb)
            r_p.append(rr)
            t_p.append(tt)
            su_p.append(su)
            sd_p.append(sd)
        Rp = [[r_p[i] if i == j else zero for j in range(NREG)]
              for i in range(NREG)]
        Tp = [[t_p[i] if i == j else zero for j in range(NREG)]
              for i in range(NREG)]
        src_up = su_p
        src_dn = sd_p
        if any_expm:
            # side-emissivity-scaled transfer rates
            # (radiation_spartacus_lw.F90:311-338)
            trs = [[trl[..., i, j][..., None] + zero
                    for j in range(NREG)] for i in range(NREG)]
            trs[1][0] = trs[1][0] * sidel
            trs[2][0] = trs[2][0] * sidel
            # exchange matrix: X[i][i] = sum_j tr[i][j]; X[i][j] = -tr[j][i]
            D = [[(odr[i] * g1r[i] + sum(trs[i][k] for k in range(NREG))
                   if i == j else -trs[j][i])
                  for j in range(NREG)] for i in range(NREG)]
            G2d = [odr[r] * g2r[r] for r in range(NREG)]
            G = [[None] * (2 * NREG) for _ in range(2 * NREG)]
            for i in range(NREG):
                for j in range(NREG):
                    G[i][j] = D[i][j]
                    G[i][NREG + j] = -G2d[i] if i == j else zero
                    G[NREG + i][j] = G2d[i] if i == j else zero
                    G[NREG + i][NREG + j] = -D[i][j]
            emis = [odr[r] * (1.0 - ssar[r]) * rfr[r] * LW_DIFFUSIVITY
                    for r in range(NREG)]
            dpl = plb - plt
            pt = [-emis[r] * plt for r in range(NREG)] \
                + [emis[r] * plt for r in range(NREG)]
            pd = [-emis[r] * dpl for r in range(NREG)] \
                + [emis[r] * dpl for r in range(NREG)]
            sol_d = [-x for x in pl_solve_vec(G, pd)]
            sol0 = pl_solve_vec(G, [sol_d[i] - pt[i]
                                    for i in range(2 * NREG)])
            E = pl_expm(G)
            E11 = [row[0:NREG] for row in E[0:NREG]]
            E12 = [row[NREG:] for row in E[0:NREG]]
            E21 = [row[0:NREG] for row in E[NREG:]]
            E22 = [row[NREG:] for row in E[NREG:]]
            R_e = [[-x for x in row] for row in pl_solve_mat(E11, E12)]
            T_e = pl_matmul(E21, R_e)
            T_e = [[T_e[i][j] + E22[i][j] for j in range(NREG)]
                   for i in range(NREG)]
            v12 = pl_matvec(E12, sol0[NREG:])
            tmp = [sol0[i] + sol_d[i] - v12[i] for i in range(NREG)]
            xs_ = pl_solve_vec(E11, tmp)
            su_e = [sol0[i] - xs_[i] for i in range(NREG)]
            v21 = pl_matvec(E21, [su_e[i] - sol0[i]
                                  for i in range(NREG)])
            v22 = pl_matvec(E22, sol0[NREG:])
            sd_e = [v21[i] + sol0[NREG + i] - v22[i] + sol_d[NREG + i]
                    for i in range(NREG)]
            for i in range(NREG):
                for j in range(NREG):
                    Rp[i][j] = jnp.where(uem, R_e[i][j], Rp[i][j])
                    Tp[i][j] = jnp.where(uem, T_e[i][j], Tp[i][j])
            src_up = [jnp.where(uem, su_e[r], src_up[r])
                      for r in range(NREG)]
            src_dn = [jnp.where(uem, sd_e[r], src_dn[r])
                      for r in range(NREG)]
        # clear layers: only the [0,0] / region-0 entries survive
        # (select, never a 0/1 multiply — masked entries may be NaN
        # from the degenerate expm branch)
        clrb = clr[..., None]
        z0 = jnp.zeros((), dtype)
        for i in range(NREG):
            for j in range(NREG):
                if i == 0 and j == 0:
                    continue
                Rp[i][j] = jnp.where(clrb, z0, Rp[i][j])
                Tp[i][j] = jnp.where(clrb, z0, Tp[i][j])
        for r in range(1, NREG):
            src_up[r] = jnp.where(clrb, z0, src_up[r])
            src_dn[r] = jnp.where(clrb, z0, src_dn[r])
        from ecrad_tpu.solvers.matrix import planes_to, vplanes_to
        return (planes_to(Rp), planes_to(Tp), vplanes_to(src_up),
                vplanes_to(src_dn))

    def layer_mats_array(xs):
        od3l, ssa3l, g3l, trl, sidel, rf, clr, plt, plb, uem = xs
        g1, g2 = two_stream.lw_gammas(ssa3l, g3l)
        rfb = rf[:, None, :]
        r_mw, t_mw, su_mw, sd_mw = two_stream.lw_ref_trans(
            od3l, ssa3l, g3l, rfb * plt[..., None], rfb * plb[..., None])
        R = _diag(r_mw)
        T = _diag(t_mw)
        src_up = su_mw
        src_dn = sd_mw
        if any_expm:
            # side-emissivity-scaled transfer rates
            # (radiation_spartacus_lw.F90:311-338)
            trs = jnp.broadcast_to(
                trl[:, None, :, :],
                sidel.shape + (NREG, NREG)).copy()
            trs = trs.at[..., 1, 0].mul(sidel)
            trs = trs.at[..., 2, 0].mul(sidel)
            D = _diag(od3l * g1) + _exchange(trs)
            G2 = _diag(od3l * g2)
            G = jnp.concatenate([
                jnp.concatenate([D, -G2], -1),
                jnp.concatenate([G2, -D], -1)], -2)
            emis = od3l * (1.0 - ssa3l) * rfb * LW_DIFFUSIVITY
            pt = jnp.concatenate([-emis * plt[..., None],
                                  emis * plt[..., None]], -1)
            pd = jnp.concatenate(
                [-emis * (plb - plt)[..., None],
                 emis * (plb - plt)[..., None]], -1)
            sol_d = -solve_vec(G, pd)
            sol0 = solve_vec(G, sol_d - pt)
            E = expm(G)
            E11 = E[..., 0:3, 0:3]
            E12 = E[..., 0:3, 3:6]
            E21 = E[..., 3:6, 0:3]
            E22 = E[..., 3:6, 3:6]
            R_e = -solve_mat(E11, E12)
            T_e = E21 @ R_e + E22
            tmp = sol0[..., 0:3] + sol_d[..., 0:3] \
                - mat_x_vec(E12, sol0[..., 3:6])
            su_e = sol0[..., 0:3] - solve_vec(E11, tmp)
            sd_e = mat_x_vec(E21, su_e - sol0[..., 0:3]) \
                + sol0[..., 3:6] - mat_x_vec(E22, sol0[..., 3:6]) \
                + sol_d[..., 3:6]
            m = uem[..., None, None]
            R = jnp.where(m, R_e, R)
            T = jnp.where(m, T_e, T)
            src_up = jnp.where(uem[..., None], su_e, src_up)
            src_dn = jnp.where(uem[..., None], sd_e, src_dn)
        R, T = _zero_clear([R, T], clr)
        sm = clr[:, None, None]
        keepv = jnp.zeros((NREG,), dtype).at[0].set(1.0)
        src_up = jnp.where(sm, src_up * keepv, src_up)
        src_dn = jnp.where(sm, src_dn * keepv, src_dn)
        return R, T, src_up, src_dn

    lev = lambda a: jnp.moveaxis(a, 1, 0)
    xs_mats = (lev(od3), lev(ssa3), lev(g3), lev(tr), lev(side_emiss),
               lev(reg_fracs), lev(clear_layer), lev(pl_top),
               lev(pl_bot), lev(use_expm))
    if _use_plane_layer_mats():
        Rs, Ts, SUs, SDs = _map_levels(layer_mats_planes, xs_mats, nlev)
    else:
        Rs, Ts, SUs, SDs = jax.lax.map(layer_mats_array, xs_mats)

    # clear-sky scalar layer properties
    r_cl, t_cl, su_cl, sd_cl = two_stream.lw_ref_trans(
        od, ssa, g, pl_top, pl_bot)

    clear_pad = jnp.concatenate(
        [jnp.ones((ncol, 1), bool), clear_layer,
         jnp.ones((ncol, 1), bool)], axis=1)
    multilayer = config.do_3d_lw_multilayer_effects

    def up_step(carry, xs):
        alb, src, alb_c, src_c = carry
        (R, T, SU, SD, rcl, tcl, sucl, sdcl, u, v, clr, clr_above) = xs
        out = (alb, src, alb_c, src_c)
        # clear-sky scalar (radiation_spartacus_lw.F90:425-437)
        inv_d = 1.0 / (1.0 - alb_c * rcl)
        alb_c_new = rcl + tcl * tcl * alb_c * inv_d
        src_c_new = sucl + tcl * (src_c + alb_c * sdcl) * inv_d
        # matrix branch (L452-467); reduces exactly to the reference's
        # per-region diagonal branch (L468-484) when all inputs diagonal
        denom = eye3 - alb @ R
        X = R + T @ solve_mat(denom, alb @ T)
        S = SU + mat_x_vec(T, solve_vec(denom, src + mat_x_vec(alb, SD)))
        # clear-layer scalar branch (L438-451), region 0
        a00 = alb[..., 0, 0]
        inv_s = 1.0 / (1.0 - a00 * R[..., 0, 0])
        x00 = R[..., 0, 0] + T[..., 0, 0] ** 2 * a00 * inv_s
        s0 = SU[..., 0] + T[..., 0, 0] * (src[..., 0]
                                          + a00 * SD[..., 0]) * inv_s
        cm = clr[:, None, None]
        X = jnp.where(cm[..., None], _embed00(x00, X), X)
        S = jnp.where(cm, _embed00(s0, S), S)
        # mixing (L485-508)
        both_clear = (clr & clr_above)[:, None, None]
        src_mixed = jnp.einsum("cij,cgj->cgi", u, S)
        src_new = jnp.where(both_clear, _embed00(S[..., 0], S), src_mixed)
        if multilayer:
            mixed = jnp.einsum("cij,cgjk,ckl->cgil", u, X, v)
        else:
            mixed = _diag(jnp.einsum("cgj,cji->cgi", _diag_part(X), v))
        alb_new = jnp.where(both_clear[..., None],
                            _embed00(X[..., 0, 0], X), mixed)
        return (alb_new, src_new, alb_c_new, src_c_new), out

    alb0 = _diag(jnp.broadcast_to(albedo[:, :, None], (ncol, ng, NREG)))
    src0 = emission[:, :, None] * reg_fracs[:, -1, None, :]
    carry0 = (alb0, src0, jnp.broadcast_to(albedo, (ncol, ng)), emission)
    xs_up = (Rs, Ts, SUs, SDs,
             lev(r_cl), lev(t_cl), lev(su_cl), lev(sd_cl),
             lev(u_mat[:, :-1]), lev(v_mat[:, :-1]),
             lev(clear_layer), lev(clear_pad[:, :-2]))
    (alb_f, src_f, alb_c_f, src_c_f), (alb_s, src_s, alb_c_s, src_c_s) = \
        jax.lax.scan(up_step, carry0, xs_up, reverse=True)

    # ---- downward pass (radiation_spartacus_lw.F90:509-595)
    def dn_step(carry, xs):
        fdn, fdn_c = carry
        (R, T, SU, SD, rcl, tcl, sucl, sdcl, src_n, alb_n, src_cn,
         alb_cn, v_below, clr, clr_below) = xs
        fdn_c2 = (tcl * fdn_c + rcl * src_cn + sdcl) \
            / (1.0 - rcl * alb_cn)
        fup_c = src_cn + alb_cn * fdn_c2
        denom = eye3 - R @ alb_n
        fdn_above = solve_vec(denom, mat_x_vec(T, fdn)
                              + mat_x_vec(R, src_n) + SD)
        fup_above = mat_x_vec(alb_n, fdn_above) + src_n
        f0 = (T[..., 0, 0] * fdn[..., 0] + R[..., 0, 0] * src_n[..., 0]
              + SD[..., 0]) / (1.0 - R[..., 0, 0] * alb_n[..., 0, 0])
        u0 = src_n[..., 0] + alb_n[..., 0, 0] * f0
        cm = clr[:, None, None]
        fdn_above = jnp.where(cm, _embed00(f0, fdn_above), fdn_above)
        fup_above = jnp.where(cm, _embed00(u0, fup_above), fup_above)
        skip = (clr & clr_below)[:, None, None]
        fdn_next = jnp.where(
            skip, fdn_above,
            jnp.einsum("cij,cgj->cgi", v_below, fdn_above))
        return (fdn_next, fdn_c2), (fup_above, fdn_above, fup_c, fdn_c2)

    carry_dn0 = (jnp.zeros((ncol, ng, NREG), dtype),
                 jnp.zeros((ncol, ng), dtype))
    xs_dn = (Rs, Ts, SUs, SDs,
             lev(r_cl), lev(t_cl), lev(su_cl), lev(sd_cl),
             src_s, alb_s, src_c_s, alb_c_s,
             lev(v_mat[:, 1:]), lev(clear_layer), lev(clear_pad[:, 2:]))
    _, (fup_l, fdn_l, fup_cl, fdn_cl) = jax.lax.scan(
        dn_step, carry_dn0, xs_dn)

    tolev = lambda a: jnp.moveaxis(a, 0, 1)
    fup_g = jnp.concatenate([jnp.sum(src_f, -1)[:, None],
                             jnp.sum(tolev(fup_l), -1)], 1)
    fdn_g = jnp.concatenate([jnp.zeros((ncol, 1, ng), dtype),
                             jnp.sum(tolev(fdn_l), -1)], 1)
    fup_c_g = jnp.concatenate([src_c_f[:, None], tolev(fup_cl)], 1)
    fdn_c_g = jnp.concatenate([jnp.zeros((ncol, 1, ng), dtype),
                               tolev(fdn_cl)], 1)

    lw_derivatives = None
    if config.do_lw_derivatives:
        # calc_lw_derivatives_matrix (radiation_lw_derivatives.F90:138-193)
        fup_surf_g = jnp.sum(fup_l[-1], -1)       # (ncol, ng)
        dinit = _embed00(
            fup_surf_g / jnp.maximum(
                jnp.sum(fup_surf_g, -1, keepdims=True), 1e-300),
            jnp.zeros((ncol, ng, NREG), dtype))

        def deriv_step(d, xs):
            T, u_below = xs
            d = jnp.einsum("cij,cgj->cgi", u_below, d)
            d = mat_x_vec(T, d)
            return d, jnp.sum(d, axis=(-2, -1))

        _, dvals = jax.lax.scan(
            deriv_step, dinit, (Ts, lev(u_mat[:, 1:])), reverse=True)
        lw_derivatives = jnp.concatenate(
            [dvals.T, jnp.ones((ncol, 1), dtype)], 1)

    return lw_from_g_profiles(
        flux_up_g=fup_g, flux_dn_g=fdn_g,
        flux_up_clear_g=fup_c_g, flux_dn_clear_g=fdn_c_g,
        cloud_cover=P["cloud_cover"], lw_derivatives=lw_derivatives,
        spec_matrix=spec_matrix)
