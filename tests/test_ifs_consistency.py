"""Cross-driver consistency: offline driver vs IFS-path radiation scheme.

The reference validates that its three drivers (ecrad, ecrad_ifs,
ecrad_ifs_blocked) produce matching net fluxes for every configuration
(test/ifs/Makefile:37-48, test/ifs/CMakeLists.txt:70-205), with a
BITIDENTITY_TESTING build mode that pins effective radii / overlap /
seed so the comparison is exact (Makefile:66-69,
driver/ecrad_ifs_driver.F90:445-452).  This module is the equivalent:
run the offline path and the IFS path (ecrad_tpu.ifs.driver with
--bitidentity pinning) on ecrad_meridian and assert the net fluxes
agree within the reference's dp thresholds.
"""

import os

import numpy as np
import jax.numpy as jnp

from ecrad_tpu.config import Config

from . import golden


def test_offline_vs_ifs_net_fluxes(tmp_path):
    from ecrad_tpu.ifs.driver import run_ifs
    from ecrad_tpu.io.input import DriverConfig, read_input

    # offline path
    config = Config.from_namelist(golden.CONFIG_NAM)
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    extra = {"aerosol": {"mixing_ratio": jnp.asarray(inp.aerosol_mmr)}}
    flux, _ = golden.run_config(config, extra_inputs=extra)
    net_sw_offline = np.asarray(flux.sw_dn - flux.sw_up)
    net_lw_offline = np.asarray(flux.lw_dn - flux.lw_up)

    # IFS path, bitidentity-pinned, writing a net-flux file like the
    # reference's ecrad_ifs binary
    out_nc = str(tmp_path / "ifs_out.nc")
    out = run_ifs(golden.CONFIG_NAM, golden.INPUT_FILE, out_nc,
                  bitidentity=True)
    net_sw_ifs = np.asarray(out["flux_sw"])
    net_lw_ifs = np.asarray(out["flux_lw"])

    # same core radiation() with identical pinned inputs: agreement far
    # inside the reference's dp thresholds (LW 0.001 / SW 0.1 W m-2)
    err_lw = np.abs(net_lw_offline - net_lw_ifs).max()
    err_sw = np.abs(net_sw_offline - net_sw_ifs).max()
    print(f"net flux consistency: LW {err_lw:.2e}, SW {err_sw:.2e}")
    assert err_lw < 1e-3
    assert err_sw < 1e-2

    # the written net-flux file round-trips
    from ecrad_tpu.io.netcdf import NcFile
    with NcFile(out_nc) as f:
        for var, ours in (("flux_net_sw", net_sw_ifs),
                          ("flux_net_lw", net_lw_ifs)):
            assert f.exists(var)
            v = f.get(var)
            assert np.isfinite(v).all()
            assert np.abs(v - ours).max() < 1e-3 + 2e-5 * np.abs(
                ours).max()
        # IFS driver writes net fluxes only
        assert not f.exists("flux_up_sw")
    # UV/PAR diagnostics present and physical
    assert np.all(np.asarray(out["flux_uv"]) >= 0.0)
    assert np.all(np.asarray(out["flux_par"]) >= 0.0)
    assert np.asarray(out["flux_par"]).max() > 10.0  # sunlit columns


def test_uv_par_weights_ecckd():
    """UV/PAR weights must work for ecCKD gas optics via the spectral
    definition (per-g-point), not just RRTMG bands — and the UV
    biologically effective weights (radiation_config.F90:1724-1764)
    are only available there."""
    from ecrad_tpu.ifs.scheme import setup_radiation_scheme

    nam = os.path.join(golden.TEST_IFS, "configCY49R1_ecckd.nam")
    config = Config.from_namelist(nam)
    scheme = setup_radiation_scheme(config)
    ng = scheme.config.n_g_sw
    assert scheme.config.do_cloud_aerosol_per_sw_g_point
    # per-g weights: indices within [0, ng), positive weights
    for ib, w in ((scheme.iband_uv, scheme.weight_uv),
                  (scheme.iband_par, scheme.weight_par)):
        assert len(ib) > 0 and np.all((ib >= 0) & (ib < ng))
        assert np.all(w > 0.0)
    # PAR weights sum to ~ the 0.4-0.7um fraction of bands they touch:
    # each g fully inside the range has weight ~1 (use_fluxes mapping)
    assert scheme.weight_par.max() <= 1.0 + 1e-6
    # UV biological weights present for ecCKD
    assert scheme.ig_uv_bio is not None
    assert np.all(scheme.weight_uv_bio > 0.0)
    assert np.all((scheme.ig_uv_bio >= 0) & (scheme.ig_uv_bio < ng))
    # erythemal action spectrum is ~1 below 298nm and <= ~1.5e-3 above
    # 328nm, so max weight should be <= 1
    assert scheme.weight_uv_bio.max() <= 1.0 + 1e-6


def test_four_way_cross_validation(tmp_path):
    """The reference validates 4 binaries per configuration — ecrad,
    ecrad+net-fluxes, ecrad_ifs, ecrad_ifs_blocked — against each other
    (test/ifs/CMakeLists.txt:70-205).  Equivalent here: offline full
    fluxes, offline net-flux file, IFS path, and NPROMA-blocked IFS
    path (nproma=10 => 4 blocks with padding) must agree on net fluxes
    within the reference's dp thresholds."""
    from ecrad_tpu.ifs.driver import run_ifs
    from ecrad_tpu.io.input import DriverConfig, read_input
    from ecrad_tpu.io.netcdf import NcFile

    # 1) offline full-flux path
    config = Config.from_namelist(golden.CONFIG_NAM)
    dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
    inp = read_input(golden.INPUT_FILE, dc)
    extra = {"aerosol": {"mixing_ratio": jnp.asarray(inp.aerosol_mmr)}}
    flux, _ = golden.run_config(config, extra_inputs=extra)
    net_sw = np.asarray(flux.sw_dn - flux.sw_up)
    net_lw = np.asarray(flux.lw_dn - flux.lw_up)

    # 2) offline driver writing a net-flux file
    from ecrad_tpu.io.output import save_net_fluxes
    net_nc = str(tmp_path / "net.nc")
    save_net_fluxes(net_nc, config, flux,
                    inp.thermodynamics.pressure_hl)
    with NcFile(net_nc) as f:
        np.testing.assert_allclose(f.get("flux_net_sw"), net_sw,
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(f.get("flux_net_lw"), net_lw,
                                   rtol=1e-6, atol=1e-6)

    # 3) IFS path / 4) blocked IFS path (both bitidentity-pinned)
    out_ifs = run_ifs(golden.CONFIG_NAM, golden.INPUT_FILE, None,
                      bitidentity=True)
    out_blk = run_ifs(golden.CONFIG_NAM, golden.INPUT_FILE, None,
                      bitidentity=True, nproma=10)

    for name, ref_arr in (("flux_sw", net_sw), ("flux_lw", net_lw)):
        a_ifs = np.asarray(out_ifs[name])
        a_blk = np.asarray(out_blk[name])
        thr = 1e-3 if name == "flux_lw" else 1e-2
        assert np.abs(a_ifs - ref_arr).max() < thr, name
        assert np.abs(a_blk - ref_arr).max() < thr, name
        # blocked vs unblocked IFS: identical executable per block =>
        # tight agreement
        assert np.abs(a_blk - a_ifs).max() < 1e-9, name

    # blocked diagnostics match too (UV/PAR/derivatives)
    for key in ("flux_uv", "flux_par"):
        np.testing.assert_allclose(np.asarray(out_blk[key]),
                                   np.asarray(out_ifs[key]),
                                   rtol=1e-9, atol=1e-9)
