"""Shared interpolation primitives for the RRTMG taumol kernels.

The reference accesses flattened ABSA/ABSB tables with precomputed flat
indices (e.g. ifsrrtm/rrtm_taumol1.F90:200-280, rrtm_taumol3.F90:95-310).
Here tables are reshaped to explicit (jp, jt, js, g) axes at load time and
accessed with vectorized gathers; XLA lowers these to efficient dynamic
gathers with the g axis on TPU lanes.

All index arrays are 0-based (ncol, nlev) int32; results are
(ncol, nlev, ng).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

ONEMINUS = 1.0 - 1.0e-6


# --- table reshaping (host-side, numpy, at setup) ------------------------

def reshape_ka1(kao: np.ndarray) -> np.ndarray:
    """KAO(5,13,ng) (jt,jp,g) → (13,5,ng) (jp,jt,g)."""
    return np.ascontiguousarray(np.transpose(kao, (1, 0, 2)))


def reshape_kb1(kbo: np.ndarray) -> np.ndarray:
    """KBO(5,47,ng) (jt,jp,g) → (47,5,ng) (jp,jt,g)."""
    return np.ascontiguousarray(np.transpose(kbo, (1, 0, 2)))


def reshape_ka2(kao: np.ndarray) -> np.ndarray:
    """KAO(9,5,13,ng) (js,jt,jp,g) → (13,5,9,ng) (jp,jt,js,g)."""
    return np.ascontiguousarray(np.transpose(kao, (2, 1, 0, 3)))


def reshape_kb2(kbo: np.ndarray) -> np.ndarray:
    """KBO(5,5,47,ng) (js,jt,jp,g) → (47,5,5,ng) (jp,jt,js,g)."""
    return np.ascontiguousarray(np.transpose(kbo, (2, 1, 0, 3)))


def reshape_minor2(kam: np.ndarray) -> np.ndarray:
    """KA_Mxxx(9,19,ng) (js,jt,g) → (19,9,ng) (jt,js,g)."""
    return np.ascontiguousarray(np.transpose(kam, (1, 0, 2)))


# --- gathers -------------------------------------------------------------

def _take2(table, idx):
    """table (n, ng); idx (...,) → (..., ng)."""
    return jnp.take(table, idx, axis=0)


def major_1(table, jp, jt, jt1, fac00, fac01, fac10, fac11, jp_offset=0):
    """1-key-species major absorption (e.g. rrtm_taumol1.F90:202-236).

    table: (njp, 5, ng) jp-major; jp_offset subtracted from jp first
    (upper-atmosphere tables start at jp index 12).
    Returns k (ncol, nlev, ng) — multiply by the column amount outside.
    """
    njp = table.shape[0]
    flat = table.reshape((-1,) + table.shape[2:])      # (njp*5, ng)
    jp0 = jnp.clip(jp - jp_offset, 0, njp - 1)
    jp1 = jnp.clip(jp + 1 - jp_offset, 0, njp - 1)
    i00 = jp0 * 5 + jt
    i10 = jp0 * 5 + jt + 1
    i01 = jp1 * 5 + jt1
    i11 = jp1 * 5 + jt1 + 1
    f = lambda fac, i: fac[..., None] * _take2(flat, i)
    return f(fac00, i00) + f(fac10, i10) + f(fac01, i01) + f(fac11, i11)


def spec_setup(n_eta, colgas1, colgas2, rat):
    """Binary species parameter setup (rrtm_taumol3.F90:119-124 pattern).

    n_eta: 8 for lower (9-point eta axis), 4 for upper (5-point).
    Returns (speccomb, specparm, js0, fs): js0 is the 0-based eta index.
    """
    speccomb = colgas1 + rat * colgas2
    specparm = jnp.minimum(colgas1 / speccomb, ONEMINUS)
    specmult = n_eta * specparm
    js0 = specmult.astype(jnp.int32)          # 0-based (Fortran js-1)
    fs = specmult - js0
    return speccomb, specparm, js0, fs


def major_2(table, jp, jt, jt1, fac00, fac01, fac10, fac11,
            speccomb, specparm, js, fs, speccomb1, specparm1, js1, fs1,
            jp_offset=0, eta_edges=True):
    """2-key-species major absorption with eta interpolation, including the
    quartic eta-edge corrections for specparm < 0.125 / > 0.875
    (rrtm_taumol3.F90:170-289 pattern).

    table: (njp, 5, n_js, ng); js/js1 0-based.
    eta_edges: bands using the 9-point eta axis apply the edge scheme;
    bands that don't (e.g. taumol9/12-like linear eta) pass False.
    Returns tau_major_total = speccomb-weighted sum of both jp planes.
    """
    njp, _, njs = table.shape[0], table.shape[1], table.shape[2]
    flat = table.reshape((-1,) + table.shape[3:])       # (njp*5*njs, ng)

    def one_side(jp_side, jt_side, facA, facB, speccomb_s, specparm_s,
                 js_s, fs_s):
        """facA = fac at jt, facB = fac at jt+1 (e.g. fac00, fac10)."""
        jp0 = jnp.clip(jp_side - jp_offset, 0, njp - 1)
        base = (jp0 * 5 + jt_side) * njs

        def kval(djs, djt):
            idx = jnp.clip(base + js_s + djs + djt * njs, 0,
                           flat.shape[0] - 1)
            return _take2(flat, idx)

        if eta_edges:
            # three regimes on specparm
            p_lo = fs_s - 1.0
            p4_lo = p_lo ** 4
            fk0_lo, fk1_lo, fk2_lo = p4_lo, 1.0 - p_lo - 2.0 * p4_lo, \
                p_lo + p4_lo
            p_hi = -fs_s
            p4_hi = p_hi ** 4
            fk0_hi, fk1_hi, fk2_hi = p4_hi, 1.0 - p_hi - 2.0 * p4_hi, \
                p_hi + p4_hi

            lo = specparm_s < 0.125
            hi = specparm_s > 0.875
            # mid-regime uses (1-fs, fs) on (0,+1)
            fk0 = jnp.where(lo, fk0_lo, jnp.where(hi, fk0_hi, 1.0 - fs_s))
            fk1 = jnp.where(lo, fk1_lo, jnp.where(hi, fk1_hi, fs_s))
            fk2 = jnp.where(lo, fk2_lo, jnp.where(hi, fk2_hi, 0.0))
            # js offsets per regime: lo → (0,1,2); hi → (+1,0,-1);
            # mid → (0,1,·)
            d0 = jnp.where(hi, 1, 0)
            d1 = jnp.where(hi, 0, 1)
            d2 = jnp.where(hi, -1, 2)

            def side_tau(fac):
                facn = fac[..., None]
                return facn * (
                    fk0[..., None] * _take2(flat, jnp.clip(
                        base + js_s + d0, 0, flat.shape[0] - 1))
                    + fk1[..., None] * _take2(flat, jnp.clip(
                        base + js_s + d1, 0, flat.shape[0] - 1))
                    + fk2[..., None] * _take2(flat, jnp.clip(
                        base + js_s + d2, 0, flat.shape[0] - 1)))

            def side_tau_jt1(fac):
                facn = fac[..., None]
                return facn * (
                    fk0[..., None] * _take2(flat, jnp.clip(
                        base + njs + js_s + d0, 0, flat.shape[0] - 1))
                    + fk1[..., None] * _take2(flat, jnp.clip(
                        base + njs + js_s + d1, 0, flat.shape[0] - 1))
                    + fk2[..., None] * _take2(flat, jnp.clip(
                        base + njs + js_s + d2, 0, flat.shape[0] - 1)))

            tau = side_tau(facA) + side_tau_jt1(facB)
        else:
            fs_n = fs_s[..., None]
            tau = (facA[..., None] * ((1.0 - fs_n) * kval(0, 0)
                                      + fs_n * kval(1, 0))
                   + facB[..., None] * ((1.0 - fs_n) * kval(0, 1)
                                       + fs_n * kval(1, 1)))
        return speccomb_s[..., None] * tau

    tau0 = one_side(jp, jt, fac00, fac10, speccomb, specparm, js, fs)
    tau1 = one_side(jp + 1, jt1, fac01, fac11, speccomb1, specparm1,
                    js1, fs1)
    return tau0 + tau1


def self_continuum(selfref, selffac, selffrac, indself):
    """rrtm_taumol1.F90:219-222. selfref (10, ng)."""
    s0 = _take2(selfref, indself)
    s1 = _take2(selfref, indself + 1)
    return selffac[..., None] * (s0 + selffrac[..., None] * (s1 - s0))


def foreign_continuum(forref, forfac, forfrac, indfor):
    """rrtm_taumol1.F90:224-226. forref (3|4, ng)."""
    f0 = _take2(forref, jnp.clip(indfor, 0, forref.shape[0] - 1))
    f1 = _take2(forref, jnp.clip(indfor + 1, 0, forref.shape[0] - 1))
    return forfac[..., None] * (f0 + forfrac[..., None] * (f1 - f0))


def minor_1(kminor, scale, minorfrac, indminor):
    """1-D minor-gas absorption (rrtm_taumol1.F90:228-231).
    kminor (19, ng)."""
    m0 = _take2(kminor, indminor)
    m1 = _take2(kminor, indminor + 1)
    return scale[..., None] * (m0 + minorfrac[..., None] * (m1 - m0))


def minor_2(kminor, jm, fm, minorfrac, indminor):
    """Eta-dependent minor-gas absorption (rrtm_taumol3.F90:139-143 +
    225-232 pattern). kminor (19, 9, ng) (jt, js, g); jm 0-based.

    Returns absorption coefficient (multiply by adjusted column outside)."""
    flat = kminor.reshape((-1,) + kminor.shape[2:])    # (19*9, ng)
    njs = kminor.shape[1]
    fmn = fm[..., None]

    def at(jt, js):
        idx = jnp.clip(jt * njs + js, 0, flat.shape[0] - 1)
        return _take2(flat, idx)

    m1 = at(indminor, jm) + fmn * (at(indminor, jm + 1)
                                   - at(indminor, jm))
    m2 = at(indminor + 1, jm) + fmn * (at(indminor + 1, jm + 1)
                                       - at(indminor + 1, jm))
    return m1 + minorfrac[..., None] * (m2 - m1)


def planck_frac_1(fracref):
    """Constant Planck fraction per g (fracref (ng,))."""
    return jnp.asarray(fracref)


def planck_frac_2(fracref, jpl, fpl):
    """Eta-interpolated Planck fraction (rrtm_taumol3.F90:300-303).
    fracref (ng, 9) (g, js); jpl 0-based."""
    f0 = jnp.take(fracref, jpl, axis=1)            # (ng, ncol, nlev)?? no:
    # fracref (ng, njs); take along axis 1 with (ncol,nlev) idx
    # → (ng, ncol, nlev); transpose to (ncol, nlev, ng)
    f0 = jnp.moveaxis(jnp.take(fracref, jpl, axis=1), 0, -1)
    f1 = jnp.moveaxis(jnp.take(fracref, jnp.clip(jpl + 1,
                                                 0, fracref.shape[1] - 1),
                               axis=1), 0, -1)
    return f0 + fpl[..., None] * (f1 - f0)
