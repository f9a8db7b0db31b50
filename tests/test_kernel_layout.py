"""Kernel-layout (nlev, ng, ncol) gas optics and the level-window
runtime guard.

The fused-solver hot path produces the big per-g fields directly in the
Pallas kernel layout (rrtmg_interp module notes).  These tests pin:

* gas_optics(layout="knl") == gas_optics(layout="cln") transposed, on
  the real meridian input (CPU, both via the gather path);
* the one-hot/windowed formulation in kernel layout matches the full
  gather exactly (forced on CPU via ECRAD_TPU_FORCE_ONEHOT);
* the round-3 review's silent-clamp hazard is closed: indices outside
  a too-narrow installed window POISON the output with NaN instead of
  silently summing wrong rows (rrtmg_interp._weighted_take_windowed),
  and windows travel in the tables dict (traced closure), not module
  state.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecrad_tpu.optics import rrtmg_interp as ri

from .conftest import DATA_DIR


def _pairs(rng, ncol, nlev, nrows, npairs, span, layout):
    base = rng.integers(0, nrows - span, size=(nlev,))
    out = []
    for _ in range(npairs):
        jitter = rng.integers(0, span, size=(ncol, nlev))
        idx = base[None, :] + jitter
        w = rng.random((ncol, nlev))
        if layout == "knl":
            idx, w = idx.T, w.T
        out.append((jnp.asarray(idx, jnp.int32),
                    jnp.asarray(w, jnp.float64)))
    return out


def test_windowed_knl_matches_full():
    rng = np.random.default_rng(0)
    ncol, nlev, nrows, ng = 16, 23, 200, 12
    table = jnp.asarray(rng.random((nrows, ng)))
    pc = _pairs(rng, ncol, nlev, nrows, 5, 11, "cln")
    pk = [(i.T, w.T) for i, w in pc]
    ref = np.asarray(ri._weighted_take_windowed(table, pc, 16))
    got = np.asarray(ri._weighted_take_windowed(table, pk, 16,
                                                layout="knl"))
    np.testing.assert_allclose(np.transpose(got, (2, 0, 1)), ref,
                               rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("layout", ["cln", "knl"])
def test_window_overflow_poisons_nan(layout):
    """A span wider than the installed width must NOT silently clamp
    (round-3 review item 2): the output is NaN-poisoned."""
    rng = np.random.default_rng(1)
    ncol, nlev, nrows, ng = 8, 9, 100, 4
    table = jnp.asarray(rng.random((nrows, ng)))
    pairs = _pairs(rng, ncol, nlev, nrows, 3, 24, layout)  # span 24 > 16
    out = np.asarray(ri._weighted_take_windowed(table, pairs, 16,
                                                layout=layout))
    assert np.isnan(out).all()

    ok = _pairs(rng, ncol, nlev, nrows, 3, 12, layout)     # span <= 16
    out = np.asarray(ri._weighted_take_windowed(table, ok, 16,
                                                layout=layout))
    assert np.isfinite(out).all()


def test_windows_travel_in_tables_not_global(monkeypatch):
    """weighted_take prefers explicit windows= over the module global;
    an over-narrow explicit window is detected (NaN), the global is not
    consulted."""
    monkeypatch.setenv("ECRAD_TPU_FORCE_ONEHOT", "1")
    rng = np.random.default_rng(2)
    nrows, ng = 64, 4
    table = jnp.asarray(rng.random((nrows, ng)))
    pairs = _pairs(rng, 8, 9, nrows, 2, 20, "cln")
    # global says full table (no window); explicit narrow window wins
    ri.set_level_windows(None)
    out = np.asarray(ri.weighted_take(table, pairs,
                                      key="k", windows={"k": 8}))
    assert np.isnan(out).all()
    # explicit covering window: exact vs gather
    ref = None
    for idx, w in pairs:
        t = np.asarray(table)[np.asarray(idx)] * np.asarray(w)[..., None]
        ref = t if ref is None else ref + t
    out = np.asarray(ri.weighted_take(table, pairs,
                                      key="k", windows={"k": 24}))
    np.testing.assert_allclose(out, ref, rtol=1e-12, atol=1e-14)


def _meridian_gas_inputs(dtype):
    from ecrad_tpu import constants
    from ecrad_tpu.config import Config
    from ecrad_tpu.data import DATA_DIR as PKG_DATA, MERIDIAN_INPUT
    from ecrad_tpu.interface import setup_radiation
    from ecrad_tpu.io.input import DriverConfig, read_input

    config = Config()
    config, tables = setup_radiation(config, data_dir=PKG_DATA)
    inp = read_input(MERIDIAN_INPUT, DriverConfig())
    phl = jnp.asarray(inp.thermodynamics.pressure_hl, dtype)
    thl = jnp.asarray(inp.thermodynamics.temperature_hl, dtype)
    gm = jnp.asarray(inp.gas_mmr, dtype)
    gdict = {n: gm[:, :, constants.GAS_INDEX[n]] for n in
             ("h2o", "co2", "ch4", "n2o", "cfc11", "cfc12", "hcfc22",
              "ccl4", "o3")}
    kw = dict(cos_sza=jnp.asarray(inp.cos_sza, dtype),
              do_lw=True, do_sw=True,
              skin_temperature=jnp.asarray(inp.skin_temperature, dtype),
              solar_irradiance=float(inp.solar_irradiance))
    return tables, phl, thl, gdict, kw


def test_gas_optics_knl_matches_cln():
    """Full RRTMG gas optics: kernel layout == classic layout on the
    meridian slice (f64 CPU, both through the gather path)."""
    from ecrad_tpu.optics import rrtmg

    tables, phl, thl, gdict, kw = _meridian_gas_inputs(jnp.float64)
    r_c = rrtmg.gas_optics(tables.gas["rrtmg"], phl, thl, gdict,
                           layout="cln", **kw)
    r_k = rrtmg.gas_optics(tables.gas["rrtmg"], phl, thl, gdict,
                           layout="knl", **kw)

    def close(a, b, prof):
        a, b = np.asarray(a), np.asarray(b)
        if prof:
            b = np.transpose(b, (2, 0, 1))
        np.testing.assert_allclose(b, a, rtol=1e-12, atol=0.0)

    close(r_c.od_lw, r_k.od_lw, True)
    close(r_c.planck_hl, r_k.planck_hl, True)
    close(r_c.lw_emission, r_k.lw_emission, False)
    close(r_c.od_sw, r_k.od_sw, True)
    close(r_c.ssa_sw, r_k.ssa_sw, True)
    close(r_c.incoming_sw, r_k.incoming_sw, False)


def test_gas_optics_knl_stale_windows_poison(monkeypatch):
    """VERDICT round-3 item 2 'done' criterion: a step traced with
    windows probed from one grid, fed inputs whose spans exceed them,
    yields NaN (never silently-corrupt optical depths).  Forced onto
    the one-hot/windowed path on CPU."""
    from ecrad_tpu.optics import rrtmg

    monkeypatch.setenv("ECRAD_TPU_FORCE_ONEHOT", "1")
    tables, phl, thl, gdict, kw = _meridian_gas_inputs(jnp.float64)
    gt = dict(tables.gas["rrtmg"])
    gt["windows"] = rrtmg.compute_interp_windows(gt, phl, thl)

    # covering windows: exact vs the gather reference
    ref = rrtmg.gas_optics(tables.gas["rrtmg"], phl, thl, gdict,
                           layout="cln", **kw)
    monkeypatch.delenv("ECRAD_TPU_FORCE_ONEHOT")
    monkeypatch.setenv("ECRAD_TPU_FORCE_ONEHOT", "1")
    got = rrtmg.gas_optics(gt, phl, thl, gdict, layout="cln", **kw)
    np.testing.assert_allclose(np.asarray(got.od_lw),
                               np.asarray(ref.od_lw),
                               rtol=1e-12, atol=0.0)

    # a "different vertical grid" streamed through the same windows:
    # scale each column's pressures by a different factor so the
    # per-level jp span across columns blows past the probed widths ->
    # NaN poison, not silent clamp
    scale = 10.0 ** jnp.linspace(-1.5, 0.0, phl.shape[0])
    bad = rrtmg.gas_optics(gt, phl * scale[:, None], thl, gdict,
                           layout="cln", **kw)
    assert bool(jnp.any(jnp.isnan(bad.od_lw)))
