"""Level-windowed weighted_take (rrtmg_interp._weighted_take_windowed)
matches the full-table formulation exactly when the window covers the
true per-level span, and the driver probe derives covering widths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ecrad_tpu.optics import rrtmg_interp as ri


def _random_levelled_pairs(rng, ncol, nlev, nrows, npairs, span):
    """Index sets whose per-level values cluster within `span` rows,
    mimicking the jp(pressure)-driven structure."""
    base = rng.integers(0, nrows - span, size=(nlev,))
    idx = []
    w = []
    for _ in range(npairs):
        jitter = rng.integers(0, span, size=(ncol, nlev))
        idx.append(jnp.asarray(base[None, :] + jitter, jnp.int32))
        w.append(jnp.asarray(rng.random((ncol, nlev)), jnp.float32))
    return list(zip(idx, w))


def _full_reference(table, pairs):
    out = None
    for idx, w in pairs:
        t = jnp.take(jnp.asarray(table), idx, axis=0) * w[..., None]
        out = t if out is None else out + t
    return out


@pytest.mark.parametrize("span,width", [(12, 16), (40, 40), (7, 8)])
def test_windowed_matches_full(span, width):
    rng = np.random.default_rng(0)
    ncol, nlev, nrows, ng = 16, 23, 585, 12
    table = jnp.asarray(rng.random((nrows, ng)), jnp.float32)
    pairs = _random_levelled_pairs(rng, ncol, nlev, nrows, 6, span)
    ref = np.asarray(_full_reference(table, pairs))
    win = np.asarray(ri._weighted_take_windowed(table, pairs, width))
    assert win.shape == ref.shape
    np.testing.assert_allclose(win, ref, rtol=5e-6, atol=5e-7)


def test_pair_span():
    rng = np.random.default_rng(1)
    pairs = _random_levelled_pairs(rng, 8, 11, 100, 3, 9)
    span = int(ri.pair_span(pairs))
    # true span per construction <= 9; probe must cover it
    all_idx = np.stack([np.asarray(i) for i, _ in pairs])
    true = int((all_idx.max(axis=(0, 1)) - all_idx.min(axis=(0, 1))).max()
               + 1)
    assert span == true


def test_window_installation_scoping():
    ri.set_level_windows({"x": 16})
    assert ri.get_level_windows() == {"x": 16}
    # width >= nrows disables windowing for that key
    assert ri._window_width("x", 10) is None
    assert ri._window_width("x", 100) == (16, 0, None)
    assert ri._window_width("y", 100) is None
    # (width, lev_start, lev_end) form restricts the level slice
    ri.set_level_windows({"x": (16, 3, 9)})
    assert ri._window_width("x", 100) == (16, 3, 9)
    ri.set_level_windows(None)
    assert ri.get_level_windows() is None


def test_windowed_level_slice():
    """Level-sliced windowed take zeroes levels outside [ls, le) and
    matches the full computation inside."""
    rng = np.random.default_rng(3)
    ncol, nlev, nrows, ng = 8, 13, 60, 5
    table = jnp.asarray(rng.random((nrows, ng)), jnp.float32)
    pairs = _random_levelled_pairs(rng, ncol, nlev, nrows, 4, 10)
    ref = np.asarray(_full_reference(table, pairs))
    got = np.asarray(ri._weighted_take_windowed(table, pairs, 16,
                                                ls=2, le=10))
    np.testing.assert_allclose(got[:, 2:10], ref[:, 2:10], rtol=5e-6,
                               atol=5e-7)
    assert (got[:, :2] == 0).all() and (got[:, 10:] == 0).all()


def test_probe_covers_meridian_spans():
    """compute_interp_windows on the meridian input produces widths that
    cover the true index spans of every keyed interpolation (checked by
    rebuilding the pair sets through the real prepare_columns)."""
    from ecrad_tpu.data import DATA_DIR, MERIDIAN_INPUT
    from ecrad_tpu.io.input import read_input
    from ecrad_tpu.optics import rrtmg as rrtmg_mod
    from ecrad_tpu.optics.rrtmg_prepare import prepare_columns
    from ecrad_tpu import constants

    tables = rrtmg_mod.setup_tables()
    inp = read_input(MERIDIAN_INPUT)
    phl = inp.thermodynamics.pressure_hl
    thl = inp.thermodynamics.temperature_hl
    windows = rrtmg_mod.compute_interp_windows(tables, phl, thl)

    def width(key):
        w = windows[key]
        return w[0] if isinstance(w, tuple) else w

    assert width("lw/m1lo") >= 1 and width("lw/m2lo/h2oco2") >= 11

    pfl = 0.5 * (phl[:, :-1] + phl[:, 1:])
    tfl = 0.5 * (thl[:, :-1] + thl[:, 1:])
    g = lambda n: inp.gas_mmr[:, :, constants.GAS_INDEX[n]]
    cols = prepare_columns(
        jnp.asarray(phl), jnp.asarray(pfl), jnp.asarray(tfl),
        jnp.asarray(g("h2o")), jnp.asarray(g("co2")), jnp.asarray(g("ch4")),
        jnp.asarray(g("n2o")), jnp.asarray(g("cfc11")),
        jnp.asarray(g("cfc12")), jnp.asarray(g("hcfc22")),
        jnp.asarray(g("ccl4")), jnp.asarray(g("o3")),
        tables["preflog"], tables["tref"], tables["chi_mls"])
    c = cols

    # m1 lower/upper true spans
    for key, njp, off in (("lw/m1lo", 13, 0), ("lw/m1hi", 47, 12)):
        pairs = ri.major_1_pairs(njp, c.jp, c.jt, c.jt1, c.fac00,
                                 c.fac01, c.fac10, c.fac11, off)
        assert int(ri.pair_span(pairs)) <= width(key), key

    # the heaviest case: LW lower eta group h2oco2 (585-row table)
    sc0, sp0, js0, fs0 = ri.spec_setup(8, c.colh2o, c.colco2,
                                       c.rat_h2oco2)
    sc1, sp1, js1, fs1 = ri.spec_setup(8, c.colh2o, c.colco2,
                                       c.rat_h2oco2_1)
    pairs = ri.major_2_pairs(13, 9, 585, c.jp, c.jt, c.jt1, c.fac00,
                             c.fac01, c.fac10, c.fac11, sc0, sp0, js0,
                             fs0, sc1, sp1, js1, fs1, 0, True)
    assert int(ri.pair_span(pairs)) <= width("lw/m2lo/h2oco2")

    # LW upper eta (1175-row table, band 3 pattern)
    sc0, sp0, js0, fs0 = ri.spec_setup(4, c.colh2o, c.colco2,
                                       c.rat_h2oco2)
    sc1, sp1, js1, fs1 = ri.spec_setup(4, c.colh2o, c.colco2,
                                       c.rat_h2oco2_1)
    pairs = ri.major_2_pairs(47, 5, 1175, c.jp, c.jt, c.jt1, c.fac00,
                             c.fac01, c.fac10, c.fac11, sc0, sp0, js0,
                             fs0, sc1, sp1, js1, fs1, 12, False)
    assert int(ri.pair_span(pairs)) <= width("lw/m2hi/3")
