#!/usr/bin/env python3
"""Extract RRTMG k-distribution coefficient data into an .npz cache.

The reference stores its gas-optics data in three places:
  1. Big-endian Fortran unformatted binaries ``data/RADRRTM``/``data/RADSRTM``
     (major-gas k tables KAO/KBO per band; read order documented in
     ifsrrtm/rrtm_init_140gp.F90:85-100 and ifsrrtm/srtm_init.F90:70-83).
  2. Inline numeric array assignments in the ``rrtm_kgb*.F90``/
     ``srtm_kgb*.F90`` sources (continuum, minor-gas, Planck-fraction and
     solar-source coefficient data).
  3. Small setup tables in ``surrtftr.F90``/``surrtpk.F90``/``surrtrf.F90``/
     ``susrtm.F90`` (g-point reduction maps, quadrature weights, reference
     pressure/temperature profiles, Planck LUTs).

This tool mechanically parses the *numeric data* (not code) from those
sources, performs the 256→140 (LW) and 224→112 (SW) g-point reduction
exactly as ifsrrtm/rrtm_cmbgb*.F90 / srtm_cmbgb*.F90 do (weighted sums with
RWGT for k-type arrays, plain sums for Planck fractions / solar source), and
writes a single NumPy archive consumed by ecrad_tpu.optics.rrtmg_data.

Usage: python tools/extract_rrtmg.py [--reference /root/reference]
                                     [--out ecrad_tpu/data/rrtmg.npz]
"""

from __future__ import annotations

import argparse
import os
import re
import struct
import sys

import numpy as np

NUM_RE = re.compile(
    r"[+-]?(?:\d+\.?\d*|\.\d+)(?:[eEdD][+-]?\d+)?(?:_[A-Za-z0-9]+)?")


def parse_number(tok: str) -> float:
    tok = re.sub(r"_[A-Za-z0-9]+$", "", tok.strip())
    return float(tok.replace("d", "e").replace("D", "e"))


def statements(text: str):
    """Yield logical Fortran statements with comments stripped and
    continuations joined."""
    logical = []
    buf = ""
    for raw in text.splitlines():
        # strip comments (no meaningful strings in these files)
        line = raw.split("!")[0].rstrip()
        if not line.strip():
            continue
        s = line.strip()
        if buf:
            if s.startswith("&"):
                s = s[1:]
            buf += " " + s
        else:
            buf = s
        if buf.endswith("&"):
            buf = buf[:-1]
        else:
            logical.append(buf)
            buf = ""
    if buf:
        logical.append(buf)
    return logical


DECL_RE = re.compile(
    r"^(REAL|INTEGER)\s*(\([^)]*\))?\s*(,\s*PARAMETER)?"
    r"\s*(,\s*DIMENSION\s*\(([^)]*)\))?\s*::\s*(.*)$", re.I)


def split_top_level_commas(s: str):
    parts, depth, buf = [], 0, ""
    for ch in s:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append(buf)
            buf = ""
        else:
            buf += ch
    if buf.strip():
        parts.append(buf)
    return parts


class Namespace:
    """Holds Fortran arrays with per-dimension lower bounds."""

    def __init__(self):
        self.arrays = {}       # name -> np.ndarray
        self.lower = {}        # name -> tuple of lower bounds (1-based dflt)
        self.params = {}       # name -> int parameter

    def declare_from(self, text: str):
        for st in statements(text):
            m = DECL_RE.match(st)
            if not m:
                continue
            is_param = bool(m.group(3))
            dim_attr = m.group(5)
            body = m.group(6)
            for item in split_top_level_commas(body):
                item = item.strip()
                if not item:
                    continue
                if is_param:
                    pm = re.match(r"(\w+)\s*=\s*(\d+)", item)
                    if pm:
                        self.params[pm.group(1).upper()] = int(pm.group(2))
                    continue
                am = re.match(r"(\w+)\s*(\(([^)]*)\))?$", item)
                if not am:
                    continue
                name = am.group(1).upper()
                dims_s = am.group(3) if am.group(3) else dim_attr
                if dims_s is None:
                    # scalar
                    self.arrays[name] = np.zeros(())
                    self.lower[name] = ()
                    continue
                shape, lower = [], []
                for d in split_top_level_commas(dims_s):
                    d = d.strip()
                    if ":" in d:
                        lo, hi = d.split(":")
                        lo, hi = self._dim(lo), self._dim(hi)
                    else:
                        lo, hi = 1, self._dim(d)
                    lower.append(lo)
                    shape.append(hi - lo + 1)
                self.arrays[name] = np.zeros(tuple(shape))
                self.lower[name] = tuple(lower)

    def _dim(self, tok: str) -> int:
        tok = tok.strip()
        if re.fullmatch(r"\d+", tok):
            return int(tok)
        if tok.upper() in self.params:
            return self.params[tok.upper()]
        raise ValueError(f"Unknown dimension token {tok!r}")

    def apply_assignments(self, text: str, only=None):
        """Apply `NAME(subs) = (/.../)` and scalar assignments."""
        for st in statements(text):
            m = re.match(r"^(\w+)\s*(\(([^)]*)\))?\s*=\s*(.*)$", st)
            if not m:
                continue
            name = m.group(1).upper()
            if name not in self.arrays:
                continue
            if only is not None and name not in only:
                continue
            subs = m.group(3)
            rhs = m.group(4).strip()
            if rhs.startswith("(/"):
                inner = rhs[2:]
                if inner.endswith("/)"):
                    inner = inner[:-2]
                vals = [parse_number(t)
                        for t in NUM_RE.findall(inner)]
                self._assign(name, subs, np.array(vals))
            else:
                rhs_ns = rhs.replace(" ", "")
                if re.fullmatch(NUM_RE, rhs_ns):
                    self._assign(name, subs, np.array(parse_number(rhs_ns)))
                else:
                    # simple scalar quotient (e.g. srtm_kgb27.F90:60
                    # SCALEKUR = 50.15_JPRB/48.37_JPRB)
                    m2 = re.fullmatch(
                        rf"({NUM_RE.pattern})/({NUM_RE.pattern})", rhs_ns)
                    if m2:
                        val = parse_number(m2.group(1)) \
                            / parse_number(m2.group(2))
                        self._assign(name, subs, np.array(val))
                # other expression/name-ref RHS → skip (handled
                # explicitly by the caller where needed)

    def _assign(self, name, subs, values):
        arr = self.arrays[name]
        lower = self.lower[name]
        if subs is None or arr.ndim == 0:
            if arr.ndim == 0:
                self.arrays[name] = values.reshape(())
            else:
                # full array fill, Fortran (column-major) order
                self.arrays[name] = values.reshape(arr.shape, order="F")
            return
        idx = []
        for d, sub in enumerate(split_top_level_commas(subs)):
            sub = sub.strip()
            if sub == ":":
                idx.append(slice(None))
            elif ":" in sub:
                lo, hi = sub.split(":")
                idx.append(slice(int(lo) - lower[d],
                                 int(hi) - lower[d] + 1))
            else:
                idx.append(int(sub) - lower[d])
        target_shape = arr[tuple(idx)].shape
        arr[tuple(idx)] = values.reshape(target_shape, order="F")

    def get(self, name):
        return self.arrays[name.upper()]


# ---------------------------------------------------------------------------
# Fortran unformatted sequential records (big-endian)

def read_records(path):
    recs = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (n,) = struct.unpack(">i", head)
            payload = f.read(n)
            (n2,) = struct.unpack(">i", f.read(4))
            assert n == n2, f"record framing mismatch in {path}"
            recs.append(payload)
    return recs


def record_to_arrays(payload, shapes):
    """Split a record into arrays of given shapes (f8 big-endian,
    Fortran order)."""
    data = np.frombuffer(payload, dtype=">f8")
    out = []
    ofs = 0
    for shp in shapes:
        n = int(np.prod(shp))
        out.append(np.asarray(data[ofs:ofs + n]).reshape(shp, order="F"))
        ofs += n
    assert ofs == data.size, f"record size {data.size} != expected {ofs}"
    return out


# ---------------------------------------------------------------------------
# g-point reduction (rrtm_cmbgb*.F90 / srtm_cmbgb*.F90 logic, generic)

def reduce_band(arr, band0, ngc, ngn_band, rwgt_band, weighted):
    """Combine raw 16 g-points into ngc groups along the g axis.

    arr: raw array with a unique axis of length 16 (the g axis)
    ngn_band: list of group sizes (len ngc, sums to 16)
    rwgt_band: (16,) weights for this band
    weighted: RWGT-weighted sum (k-type) vs plain sum (Planck/solar-type)
    """
    shape = arr.shape
    g_axes = [i for i, s in enumerate(shape) if s == 16]
    g_axis = g_axes[-1] if len(g_axes) == 1 else (
        g_axes[-1] if arr.ndim > 1 and shape[-1] == 16 else g_axes[0])
    moved = np.moveaxis(arr, g_axis, -1)
    if weighted:
        moved = moved * rwgt_band
    out = np.empty(moved.shape[:-1] + (len(ngn_band),))
    i = 0
    for c, n in enumerate(ngn_band):
        out[..., c] = moved[..., i:i + n].sum(axis=-1)
        i += n
    assert i == 16
    return np.moveaxis(out, -1, g_axis)


def compute_rwgt(wt, ngc, ngn, nbands):
    """rrtm_init_140gp.F90:118-141 / srtm_init.F90:108-132."""
    rwgt = np.ones(nbands * 16)
    igcsm = 0
    for ib in range(nbands):
        if ngc[ib] < 16:
            # group weight sums for this band, then per-raw-g weights
            wtsm = []
            ip = 0
            base = igcsm
            for igc in range(ngc[ib]):
                n = ngn[base + igc]
                wtsm.append(wt[ip:ip + n].sum())
                ip += n
                igcsm += 1
            assert ip == 16
            gi = 0
            for igc in range(ngc[ib]):
                n = ngn[base + igc]
                for _ in range(n):
                    rwgt[ib * 16 + gi] = wt[gi] / wtsm[igc]
                    gi += 1
            assert gi == 16
        else:
            igcsm += 16
    return rwgt


# ---------------------------------------------------------------------------

LW_BANDS = list(range(1, 17))
# Bands whose binary record contains only KAO (no high-altitude key species):
LW_KAO_ONLY = {6, 12, 13, 15}
SW_BANDS = list(range(16, 30))
SW_NO_KB = {23, 25, 26}   # srtm_kgb23/25 read KA only; 26 reads nothing
SW_NO_K = {26}

# Arrays combined WITHOUT weights (plain sums)
PLAIN_SUM_PREFIXES = ("FRACREF", "SFLUXREF")


def extract_lw(ref):
    ifsrrtm = os.path.join(ref, "ifsrrtm")
    out = {}

    # Setup tables
    ftr = Namespace()
    ftr.declare_from("INTEGER :: IGC140(16), IGS140(16), IGM140(256), "
                     "IGN140(140), IGB140(140)\nREAL :: WT(16)")
    ftr.apply_assignments(open(os.path.join(ifsrrtm, "surrtftr.F90")).read(),
                          only={"IGC140", "IGS140", "IGM140", "IGN140",
                                "IGB140", "WT"})
    ngc = ftr.get("IGC140").astype(int)
    ngs = ftr.get("IGS140").astype(int)
    ngn = ftr.get("IGN140").astype(int)
    ngb = ftr.get("IGB140").astype(int)
    wt = ftr.get("WT")
    out["lw_ngc"] = ngc
    out["lw_ngs"] = ngs
    out["lw_ngn"] = ngn
    out["lw_band_from_g"] = ngb - 1          # 0-based band per g-point
    out["lw_wt"] = wt

    pk = Namespace()
    pk.declare_from("INTEGER :: NG(16), NSPA(16), NSPB(16)\n"
                    "REAL :: DELWAVE(16)\nREAL :: TOTPLNK(181,16)")
    pk.apply_assignments(open(os.path.join(ifsrrtm, "surrtpk.F90")).read())
    out["lw_nspa"] = pk.get("NSPA").astype(int)
    out["lw_nspb"] = pk.get("NSPB").astype(int)
    out["lw_delwave"] = pk.get("DELWAVE")
    out["lw_totplnk"] = pk.get("TOTPLNK")

    rf = Namespace()
    rf.declare_from("REAL :: PREF(59), PREFLOG(59), TREF(59), CHI_MLS(7,59)")
    rf.apply_assignments(open(os.path.join(ifsrrtm, "surrtrf.F90")).read())
    out["pref"] = rf.get("PREF")
    out["preflog"] = rf.get("PREFLOG")
    out["tref"] = rf.get("TREF")
    out["chi_mls"] = rf.get("CHI_MLS")

    rwgt = compute_rwgt(wt, ngc, ngn, 16)
    out["lw_rwgt"] = rwgt

    # Per-band tables
    records = read_records(os.path.join(ref, "data", "RADRRTM"))
    assert len(records) == 16, f"expected 16 LW records, got {len(records)}"

    for ib, band in enumerate(LW_BANDS):
        ns = Namespace()
        ns.declare_from(open(os.path.join(ifsrrtm,
                                          f"yoerrto{band}.F90")).read())
        ns.apply_assignments(
            open(os.path.join(ifsrrtm, f"rrtm_kgb{band}.F90")).read())
        # binary record → KAO(,KBO)
        kao_shape = ns.arrays["KAO_D"].shape
        if band in LW_KAO_ONLY:
            (kao,) = record_to_arrays(records[ib], [kao_shape])
            ns.arrays["KAO"] = kao
        else:
            kbo_shape = ns.arrays["KBO_D"].shape
            kao, kbo = record_to_arrays(records[ib], [kao_shape, kbo_shape])
            ns.arrays["KAO"] = kao
            ns.arrays["KBO"] = kbo

        rwgt_band = rwgt[ib * 16:(ib + 1) * 16]
        # NGS is cumulative; groups for band ib are
        # ngn[ngs[ib-1] : ngs[ib-1]+ngc[ib]]
        start = 0 if ib == 0 else ngs[ib - 1]
        ngn_band = ngn[start:start + ngc[ib]]

        for name, arr in ns.arrays.items():
            if name.endswith("_D") or name in ("KAO_D", "KBO_D"):
                continue
            if arr.ndim == 0:
                out[f"lw{band:02d}/{name}"] = arr
                continue
            if 16 in arr.shape:
                weighted = not name.startswith(PLAIN_SUM_PREFIXES)
                red = reduce_band(arr, ib, ngc[ib], ngn_band, rwgt_band,
                                  weighted)
                # crop the g axis to ngc[ib]
                out[f"lw{band:02d}/{name}"] = red
            else:
                out[f"lw{band:02d}/{name}"] = arr
    return out


def extract_sw(ref):
    ifsrrtm = os.path.join(ref, "ifsrrtm")
    out = {}

    su = Namespace()
    su.declare_from(
        "INTEGER :: IGC112(14), IGS112(14), IGM112(224), IGN112(112), "
        "IGB112(112)\nREAL :: WT(16)\nINTEGER :: NG(14), NSPA(14), "
        "NSPB(14), NMPSRTM(14)\nREAL :: PREF(59), PREFLOG(59), TREF(59)")
    su.apply_assignments(open(os.path.join(ifsrrtm, "susrtm.F90")).read(),
                         only={"IGC112", "IGS112", "IGM112", "IGN112",
                               "IGB112", "WT", "NG", "NSPA", "NSPB",
                               "NMPSRTM", "PREF", "PREFLOG", "TREF"})
    ngc = su.get("IGC112").astype(int)
    ngs = su.get("IGS112").astype(int)
    ngn = su.get("IGN112").astype(int)
    ngb = su.get("IGB112").astype(int)
    wt = su.get("WT")
    out["sw_ngc"] = ngc
    out["sw_ngs"] = ngs
    out["sw_ngn"] = ngn
    out["sw_band_from_g"] = ngb - 16          # 0-based SW band per g-point
    out["sw_wt"] = wt
    out["sw_nspa"] = su.get("NSPA").astype(int)
    out["sw_nspb"] = su.get("NSPB").astype(int)
    out["sw_nmpsrtm"] = su.get("NMPSRTM").astype(int)

    rwgt = compute_rwgt(wt, ngc, ngn, 14)
    out["sw_rwgt"] = rwgt

    records = read_records(os.path.join(ref, "data", "RADSRTM"))
    exp_records = len([b for b in SW_BANDS if b not in SW_NO_K])
    assert len(records) == exp_records, \
        f"expected {exp_records} SW records, got {len(records)}"

    irec = 0
    for ib, band in enumerate(SW_BANDS):
        ns = Namespace()
        ns.declare_from(open(os.path.join(ifsrrtm,
                                          f"yoesrta{band}.F90")).read())
        ns.apply_assignments(
            open(os.path.join(ifsrrtm, f"srtm_kgb{band}.F90")).read())
        if band not in SW_NO_K:
            ka_shape = ns.arrays["KA_D"].shape
            if band in SW_NO_KB:
                (ka,) = record_to_arrays(records[irec], [ka_shape])
                ns.arrays["KA"] = ka
            else:
                kb_shape = ns.arrays["KB_D"].shape
                ka, kb = record_to_arrays(records[irec],
                                          [ka_shape, kb_shape])
                ns.arrays["KA"] = ka
                ns.arrays["KB"] = kb
            irec += 1

        rwgt_band = rwgt[ib * 16:(ib + 1) * 16]
        start = 0 if ib == 0 else ngs[ib - 1]
        ngn_band = ngn[start:start + ngc[ib]]

        for name, arr in ns.arrays.items():
            if name.endswith("_D") or name.endswith("C") and \
                    name[:-1] in ns.arrays:
                # skip the declared-but-unfilled "combined" outputs and _D
                continue
            if name in ("ABSA", "ABSB"):     # equivalence views, skip
                continue
            if arr.ndim == 0:
                out[f"sw{band:02d}/{name}"] = arr
                continue
            if 16 in arr.shape:
                weighted = not name.startswith(PLAIN_SUM_PREFIXES)
                red = reduce_band(arr, ib, ngc[ib], ngn_band, rwgt_band,
                                  weighted)
                out[f"sw{band:02d}/{name}"] = red
            else:
                out[f"sw{band:02d}/{name}"] = arr
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reference", default="/root/reference")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "ecrad_tpu", "data", "rrtmg.npz"))
    args = ap.parse_args()

    out = {}
    out.update(extract_lw(args.reference))
    out.update(extract_sw(args.reference))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **out)
    print(f"Wrote {len(out)} arrays to {args.out}")
    # brief summary
    for k in sorted(out):
        v = out[k]
        if hasattr(v, "shape"):
            pass
    total = sum(getattr(v, "nbytes", 0) for v in out.values())
    print(f"Total size: {total/1e6:.1f} MB")


if __name__ == "__main__":
    main()
