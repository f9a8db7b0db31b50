"""Equivalents of the reference's standalone kernel test programs
(driver/test_fast_expm.F90, driver/test_cloud_generator.F90,
driver/test_random_number_generator.F90): numerical edge cases and
statistical checks that golden-file tests cannot isolate."""

import numpy as np
import pytest


def test_fast_expm_repeated_eigenvalue_f32():
    """driver/test_fast_expm.F90: this exact input makes the exchange
    matrix's two non-zero eigenvalues (nearly) coincide, which broke the
    single-precision diagonalization before the reference's v1.6.1 fix
    (CHANGELOG).  The result must stay close to the f64 scipy answer and
    be a valid stochastic-ish matrix (columns sum to 1: the exchange
    matrix conserves energy)."""
    import scipy.linalg as sla

    from ecrad_tpu.solvers.matrix import fast_expm_exchange_3

    a = np.float32(9.0408579e-02)
    b = np.float32(9.2716664e-07)
    c = np.float32(2.2503915e-03)
    d = np.float32(8.8152386e-02)

    R32 = np.asarray(fast_expm_exchange_3(
        np.atleast_1d(a), np.atleast_1d(b), np.atleast_1d(c),
        np.atleast_1d(d)))[0]
    assert R32.dtype == np.float32

    M = np.array([[-a, b, 0.0],
                  [a, -b - c, d],
                  [0.0, c, -d]], dtype=np.float64)
    ref = sla.expm(M)

    assert np.all(np.isfinite(R32))
    # column sums of expm of a generator matrix are exactly 1
    np.testing.assert_allclose(R32.sum(axis=0), 1.0, atol=2e-5)
    np.testing.assert_allclose(R32, ref, atol=2e-4)

    # and in f64 it should be tight
    R64 = np.asarray(fast_expm_exchange_3(
        np.atleast_1d(np.float64(a)), np.atleast_1d(np.float64(b)),
        np.atleast_1d(np.float64(c)), np.atleast_1d(np.float64(d))))[0]
    np.testing.assert_allclose(R64, ref, atol=1e-9)


@pytest.fixture(scope="module")
def sampler():
    from ecrad_tpu.io.netcdf import NcFile
    from ecrad_tpu.solvers import cloud_generator_exact as cge
    with NcFile("/root/reference/data/mcica_gamma.nc") as f:
        return cge.PdfSampler(f.get("fsd"), f.get("x").T)


def test_cloud_generator_statistics(sampler):
    """driver/test_cloud_generator.F90: 2000 columns x 137 levels with
    two cloud decks (levels 19-99 and 114-124 0-based, fraction 0.1),
    exponential overlap 0.9, FSD 1.  Checks the *statistics* of the
    stochastic sample rather than any single draw:
      - per-level cloudy-sample frequency ~= the cloud fraction,
      - mean od_scaling over cloudy samples ~= 1 (gamma PDF has mean 1),
      - empirical total cover ~= the generator's analytic cover.
    """
    from ecrad_tpu.solvers import cloud_generator_exact as cge

    ncol, nlev, ng = 2000, 137, 1
    frac1 = np.zeros(nlev)
    frac1[19:100] = 0.1
    frac1[114:125] = 0.1
    frac = np.tile(frac1, (ncol, 1))
    overlap = np.full((ncol, nlev - 1), 0.9)
    fsd = np.ones((ncol, nlev))
    iseed = np.arange(1, ncol + 1, dtype=np.int64)

    od_scaling, cover = cge.cloud_generator_all_columns(
        ng=ng, i_overlap_scheme=2, iseed=iseed, frac_threshold=1e-6,
        frac=frac, overlap_param=overlap, decorrelation_scaling=0.5,
        fractional_std=fsd, pdf_sampler=sampler)

    cloudy = od_scaling[:, :, 0] > 0.0          # (ncol, nlev)

    # the generator samples subcolumns *conditioned on being within the
    # cloudy part of the column* (the solver weights the cloudy result
    # by total_cloud_cover, radiation_mcica_*.F90) — so every subcolumn
    # must contain cloud somewhere...
    assert cloudy.any(axis=1).all()

    ana_cover = cover.mean()
    # exponential overlap of 81 layers at alpha=0.9, frac 0.1 gives a
    # cover well above the single-layer 0.1 and below random-overlap 1.0
    assert 0.3 < ana_cover < 0.95

    # ...and the *unconditional* per-level cloud frequency
    # (freq-within-cloudy-subcolumn x cover) recovers the prescribed
    # fraction (binomial sigma ~ 0.007 over 2000 draws)
    lev_freq = cloudy[:, 19:100].mean() * ana_cover
    assert abs(lev_freq - 0.1) < 0.012

    # mean od scaling over cloudy cells: gamma PDF with FSD=1 has mean 1
    mean_scaling = od_scaling[:, :, 0][cloudy].mean()
    assert abs(mean_scaling - 1.0) < 0.05

    # max-random overlap: two decks separated by clear sky combine
    # randomly -> cover = 1-(1-0.1)^2 = 0.19 exactly
    _, cover_mr = cge.cloud_generator_all_columns(
        ng=ng, i_overlap_scheme=0, iseed=iseed, frac_threshold=1e-6,
        frac=frac, overlap_param=overlap, decorrelation_scaling=0.5,
        fractional_std=fsd, pdf_sampler=sampler)
    np.testing.assert_allclose(cover_mr, 0.19, atol=1e-9)


def test_rng_uniformity():
    """driver/test_random_number_generator.F90 analog: the lagged-
    Fibonacci stream driving the exact generator must be uniform on
    (0,1): mean 1/2, variance 1/12, no mass at the endpoints."""
    from ecrad_tpu.solvers import cloud_generator_exact as cge

    rng = cge.RandomStreamMix(12345)
    draws = np.concatenate([rng.uniform(1000) for _ in range(50)])
    assert draws.min() >= 0.0 and draws.max() <= 1.0
    assert abs(draws.mean() - 0.5) < 0.01
    assert abs(draws.var() - 1.0 / 12.0) < 0.005
