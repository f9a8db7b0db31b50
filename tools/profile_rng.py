#!/usr/bin/env python3
"""Microbenchmark: cloud-generator building blocks on TPU.

Isolates (a) per-column vmapped threefry draws, (b) single-key threefry,
(c) a counter-based hash RNG (murmur-style mixer), (d) the PDF LUT
bilinear gather, (e) a row-gather + take_along_axis PDF formulation,
(f) the overlap scan.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
import numpy as np

NCOL, NLEV, NG = 2048, 137, 140


def bench(fn, args, label, n=5):
    f = jax.jit(fn)
    t0 = time.time()
    r = f(*args)
    s = float(np.asarray(jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
        jax.tree_util.tree_leaves(r), jnp.float32(0.0))))
    ct = time.time() - t0
    ts = []
    for _ in range(n):
        t0 = time.time()
        r = f(*args)
        float(np.asarray(jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.sum(b.astype(jnp.float32)),
            jax.tree_util.tree_leaves(r), jnp.float32(0.0))))
        ts.append(time.time() - t0)
    print(f"  {label:44s} {min(ts)*1e3:9.2f} ms (compile {ct:.1f}s, "
          f"chk {s:.4e})", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    iseed = jnp.arange(NCOL, dtype=jnp.uint32) + 1000

    # (a) per-column vmapped threefry (current production path)
    def vmapped_threefry(iseed):
        keys = jax.vmap(lambda s: jax.random.key(s))(iseed)

        def draw(key):
            k1, k2, k3, k4 = jax.random.split(key, 4)
            trig = jax.random.uniform(k1, (NG,), jnp.float32)
            rc = jax.random.uniform(k2, (NLEV, NG), jnp.float32)
            ri = jax.random.uniform(k3, (NLEV, NG), jnp.float32)
            ri2 = jax.random.uniform(k4, (NLEV, NG), jnp.float32)
            return trig, rc, ri, ri2

        return jax.vmap(draw)(keys)

    bench(vmapped_threefry, (iseed,), "vmapped threefry (current)")

    # (b) single-key threefry, same volume
    def single_threefry(seed0):
        key = jax.random.key(seed0[0])
        k1, k2, k3, k4 = jax.random.split(key, 4)
        trig = jax.random.uniform(k1, (NCOL, NG), jnp.float32)
        rc = jax.random.uniform(k2, (NCOL, NLEV, NG), jnp.float32)
        ri = jax.random.uniform(k3, (NCOL, NLEV, NG), jnp.float32)
        ri2 = jax.random.uniform(k4, (NCOL, NLEV, NG), jnp.float32)
        return trig, rc, ri, ri2

    bench(single_threefry, (iseed,), "single-key threefry")

    # (c) counter-based hash RNG (two murmur3-finalizer rounds)
    def _mix(x):
        x = x ^ (x >> 16)
        x = x * jnp.uint32(0x7feb352d)
        x = x ^ (x >> 15)
        x = x * jnp.uint32(0x846ca68b)
        x = x ^ (x >> 16)
        return x

    def _to_unit(h):
        return (h >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
            2.0 ** -24)

    def hash_rng(iseed):
        s = _mix(iseed ^ jnp.uint32(0x9e3779b9))[:, None, None]
        idx = (jnp.arange(NLEV, dtype=jnp.uint32)[None, :, None]
               * jnp.uint32(NG)
               + jnp.arange(NG, dtype=jnp.uint32)[None, None, :])
        outs = []
        for stream in (1, 2, 3):
            h = _mix(s + _mix(idx + jnp.uint32((stream * 0x632be59b)
                                               & 0xffffffff)))
            outs.append(_to_unit(h))
        trig = _to_unit(_mix(s[:, 0] + _mix(
            jnp.arange(NG, dtype=jnp.uint32)[None, :]
            + jnp.uint32((4 * 0x632be59b) & 0xffffffff))))
        return (trig,) + tuple(outs)

    bench(hash_rng, (iseed,), "counter hash RNG (murmur x2)")

    # (d) PDF LUT bilinear via flat gather (current)
    from ecrad_tpu.interface import setup_radiation
    from ecrad_tpu.config import Config
    from ecrad_tpu.data import DATA_DIR, find_data_file
    from ecrad_tpu.io.netcdf import NcFile
    with NcFile(find_data_file(DATA_DIR, "mcica_gamma.nc")) as f:
        pdf = {"fsd": f.get("fsd"), "val": jnp.asarray(f.get("x").T,
                                                       jnp.float32)}
    print(f"  pdf LUT shape (ncdf,nfsd): {pdf['val'].shape}", flush=True)

    from ecrad_tpu.solvers.cloud_generator import sample_pdf_jnp
    cdf = jax.random.uniform(jax.random.key(0), (NCOL, NLEV, NG),
                             jnp.float32)
    fsd = jnp.full((NCOL, NLEV, 1), 0.9, jnp.float32)

    bench(lambda c, f_: sample_pdf_jnp(pdf, f_, c), (cdf, fsd),
          "pdf sample: flat gather (current)")

    # (e) PDF: gather fsd rows first, then take_along_axis on cdf
    val = pdf["val"]                       # (ncdf, nfsd)
    ncdf, nfsd = val.shape
    fsd_axis = pdf["fsd"]
    fsd1 = float(fsd_axis[0])
    inv_int = 1.0 / float(fsd_axis[1] - fsd_axis[0])

    def pdf_rows(cdf, fsd2d):
        # fsd2d: (ncol, nlev)
        wfsd = (fsd2d - fsd1) * inv_int + 1.0
        ifsd = jnp.clip(wfsd.astype(jnp.int32), 1, nfsd - 1)
        wfsd = jnp.clip(wfsd - ifsd, 0.0, 1.0)
        v0 = val.T[jnp.clip(ifsd - 1, 0, nfsd - 1)]     # (ncol,nlev,ncdf)
        v1 = val.T[jnp.clip(ifsd, 0, nfsd - 1)]
        vf = (1.0 - wfsd[..., None]) * v0 + wfsd[..., None] * v1
        wcdf = cdf * (ncdf - 1) + 1.0
        icdf = jnp.clip(wcdf.astype(jnp.int32), 1, ncdf - 1)
        wcdf = jnp.clip(wcdf - icdf, 0.0, 1.0)
        a = jnp.take_along_axis(vf, jnp.clip(icdf - 1, 0, ncdf - 1),
                                axis=-1)
        b = jnp.take_along_axis(vf, jnp.clip(icdf, 0, ncdf - 1), axis=-1)
        return (1.0 - wcdf) * a + wcdf * b

    bench(lambda c, f2: pdf_rows(c, f2), (cdf, fsd[:, :, 0]),
          "pdf sample: fsd rows + take_along_axis")

    # (f) the overlap scan alone
    from ecrad_tpu.solvers.cloud_generator import (
        cum_cloud_cover_exp_ran_jnp)
    frac = jax.random.uniform(jax.random.key(1), (NCOL, NLEV), jnp.float32)
    frac = jnp.where(frac > 0.7, frac, 0.0)
    op = jnp.full((NCOL, NLEV - 1), 0.8, jnp.float32)
    bench(cum_cloud_cover_exp_ran_jnp, (frac, op), "overlap cumulator scan")

    # (g) full current generator for reference
    from ecrad_tpu.solvers.cloud_generator import cloud_generator_device
    cfg = Config(dtype_name="float32")
    cfg, _ = setup_radiation(cfg, data_dir=DATA_DIR)
    fsd2 = jnp.full((NCOL, NLEV), 0.9, jnp.float32)
    bench(lambda s: cloud_generator_device(
        cfg, pdf, s, frac, op, fsd2, NG), (iseed.astype(jnp.int32),),
        "cloud_generator_device (current)")


if __name__ == "__main__":
    main()
