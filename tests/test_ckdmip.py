"""CKDMIP clear-sky gas-optics evaluation (test/ckdmip in the reference):
50 Evaluation-1 profiles vs line-by-line reference fluxes
(ckdmip_evaluation1_{lw,sw}_fluxes_present_reduced.nc), run with the
config-{rrtmg,ecckd}.nam configurations and the reference's protocol
(LW once; SW at the five mu0 of the flux file, test/ckdmip/Makefile).

Thresholds are ~1.5x the errors measured here (which match the
published accuracy of the schemes, e.g. Hogan & Matricardi 2022 for
ecCKD): they catch regressions in gas optics while allowing platform
rounding.
"""

import functools
import os

import numpy as np
import pytest

CKDMIP = "/root/reference/test/ckdmip"
CONC = os.path.join(CKDMIP,
                    "ckdmip_evaluation1_concentrations_present_reduced.nc")
LW_REF = os.path.join(CKDMIP,
                      "ckdmip_evaluation1_lw_fluxes_present_reduced.nc")
SW_REF = os.path.join(CKDMIP,
                      "ckdmip_evaluation1_sw_fluxes_present_reduced.nc")
DATA = "/root/reference/data"

# gas_model -> (lw_toa_bias, lw_toa_rmse, lw_sfcdn_bias, lw_sfcdn_rmse,
#               sw_toa_bias, sw_toa_rmse, sw_sfcdn_bias, sw_sfcdn_rmse)
THRESH = {
    "rrtmg": (0.5, 0.8, 0.8, 1.2, 1.7, 1.9, 2.3, 2.7),
    "ecckd": (0.1, 0.3, 0.2, 0.7, 0.8, 0.9, 0.6, 0.7),
}


@pytest.fixture(scope="module", params=["rrtmg", "ecckd"])
def model_run(request):
    import jax
    import jax.numpy as jnp

    from ecrad_tpu.config import Config
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input import DriverConfig, read_input

    gm = request.param
    nam = os.path.join(CKDMIP, f"config-{gm}.nam")
    config = Config.from_namelist(nam).replace(directory_name=DATA)
    dc = DriverConfig.from_namelist(nam)
    config, tables = setup_radiation(config, data_dir=DATA)
    inp = read_input(CONC, dc)
    fn = jax.jit(functools.partial(radiation, config, tables))

    def run(cos_sza):
        return fn(
            pressure_hl=jnp.asarray(inp.thermodynamics.pressure_hl),
            temperature_hl=jnp.asarray(inp.thermodynamics.temperature_hl),
            gas_mmr=jnp.asarray(inp.gas_mmr),
            cos_sza=jnp.asarray(cos_sza),
            skin_temperature=jnp.asarray(inp.skin_temperature),
            sw_albedo=jnp.asarray(inp.sw_albedo),
            sw_albedo_direct=None,
            lw_emissivity=jnp.asarray(inp.lw_emissivity),
            solar_irradiance=float(inp.solar_irradiance))

    return gm, run, inp


def _stats(delta):
    return float(delta.mean()), float(np.sqrt((delta ** 2).mean()))


def test_ckdmip_lw(model_run):
    from ecrad_tpu.io.netcdf import NcFile

    gm, run, inp = model_run
    tb, tr, sb, sr = THRESH[gm][:4]
    flux = run(inp.cos_sza)
    with NcFile(LW_REF) as f:
        up_ref = f.get("flux_up_lw")
        dn_ref = f.get("flux_dn_lw")
    up = np.asarray(flux.lw_up)
    dn = np.asarray(flux.lw_dn)
    bias_toa, rmse_toa = _stats(up[:, 0] - up_ref[:, 0])
    bias_sfc, rmse_sfc = _stats(dn[:, -1] - dn_ref[:, -1])
    print(f"{gm} LW TOA up: bias {bias_toa:+.3f} rmse {rmse_toa:.3f}; "
          f"sfc dn: bias {bias_sfc:+.3f} rmse {rmse_sfc:.3f}")
    assert abs(bias_toa) < tb and rmse_toa < tr
    assert abs(bias_sfc) < sb and rmse_sfc < sr
    # upwelling at the black surface is essentially exact
    _, rmse_sfc_up = _stats(up[:, -1] - up_ref[:, -1])
    assert rmse_sfc_up < 0.1


def test_ckdmip_sw(model_run):
    from ecrad_tpu.io.netcdf import NcFile

    gm, run, inp = model_run
    tb, tr, sb, sr = THRESH[gm][4:]
    with NcFile(SW_REF) as f:
        mu0 = f.get("mu0")
        up_ref = f.get("flux_up_sw")        # (col, mu0, half_level)
        dn_ref = f.get("flux_dn_sw")
    worst = {}
    for imu, mu in enumerate(mu0):
        flux = run(np.full(inp.ncol, float(mu)))
        up = np.asarray(flux.sw_up)
        dn = np.asarray(flux.sw_dn)
        bias_toa, rmse_toa = _stats(up[:, 0] - up_ref[:, imu, 0])
        bias_sfc, rmse_sfc = _stats(dn[:, -1] - dn_ref[:, imu, -1])
        print(f"{gm} SW mu0={float(mu):.1f}: TOA up bias {bias_toa:+.3f}"
              f" rmse {rmse_toa:.3f}; sfc dn bias {bias_sfc:+.3f} "
              f"rmse {rmse_sfc:.3f}")
        for k, v in (("bt", abs(bias_toa)), ("rt", rmse_toa),
                     ("bs", abs(bias_sfc)), ("rs", rmse_sfc)):
            worst[k] = max(worst.get(k, 0.0), v)
    assert worst["bt"] < tb and worst["rt"] < tr
    assert worst["bs"] < sb and worst["rs"] < sr
