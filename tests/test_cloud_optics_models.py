"""Cloud optics model zoo (radiation_cloud_optics.F90:335-460 dispatch;
liquid: SOCRATES/Slingo(+Lindner&Li LW); ice: Fu/Baran/Baran2016/
Baran2017/Yi).  No reference goldens ship for the non-default models, so
these check physical sanity and cross-model consistency on the meridian
case."""

import numpy as np
import pytest

from tests import golden


def run(liquid="SOCRATES", ice="Fu-IFS"):
    from ecrad_tpu.config import Config
    from ecrad_tpu.namelist import read_namelist_file
    nml = dict(read_namelist_file(golden.CONFIG_NAM)["radiation"])
    nml["liquid_model_name"] = liquid
    nml["ice_model_name"] = ice
    flux, _ = golden.run_config(Config.from_dict(nml))
    return flux


@pytest.fixture(scope="module")
def base():
    return run()


@pytest.mark.parametrize("liquid,ice", [
    ("Slingo", "Fu-IFS"),
    ("SOCRATES", "Baran"),
    ("SOCRATES", "Baran2016"),
    ("SOCRATES", "Baran2017"),
    ("SOCRATES", "Yi"),
])
def test_model_combination(base, liquid, ice):
    flux = run(liquid, ice)
    for attr in ("lw_up", "lw_dn", "sw_up", "sw_dn"):
        v = np.asarray(getattr(flux, attr))
        assert np.isfinite(v).all(), attr
        assert (v >= -1e-9).all(), attr
    olr = np.asarray(flux.lw_up)[:, 0]
    assert (olr > 80.0).all() and (olr < 400.0).all()
    # clear-sky fluxes are independent of the cloud optics model
    np.testing.assert_allclose(np.asarray(flux.lw_up_clear),
                               np.asarray(base.lw_up_clear), atol=1e-9)
    np.testing.assert_allclose(np.asarray(flux.sw_up_clear),
                               np.asarray(base.sw_up_clear), atol=1e-9)
    # total-sky differs from the default model pair but not wildly
    d_sw = np.abs(np.asarray(flux.sw_up) - np.asarray(base.sw_up)).max()
    d_lw = np.abs(np.asarray(flux.lw_up) - np.asarray(base.lw_up)).max()
    assert d_sw > 1e-3 or d_lw > 1e-3, "model change had no effect"
    # models legitimately differ a lot in thick cloud (e.g. Baran2016
    # asymmetry ~0.92 vs Fu ~0.80 shifts reflected SW by >200 W/m2)
    assert d_sw < 400.0 and d_lw < 100.0, (d_sw, d_lw)


def test_parameterization_units():
    """Elementwise checks on the new parameterizations."""
    import jax.numpy as jnp
    from ecrad_tpu.io.netcdf import NcFile
    from ecrad_tpu.optics import cloud as c

    with NcFile("/root/reference/data/slingo_droplet_scattering_rrtm.nc") \
            as f:
        sl_sw = f.get("coeff_sw")
        sl_lw = f.get("coeff_lw")
    lwp = jnp.array([[0.02]])          # kg m-2
    re = jnp.array([[10.0e-6]])
    od, scat, g = c.liq_slingo(sl_sw, lwp, re)
    # visible-band extinction ~ 3 LWP / (2 rho re) ~ 3 od units
    assert 1.0 < float(od.max()) < 10.0
    assert (np.asarray(scat) <= np.asarray(od) + 1e-12).all()
    assert (0.0 < np.asarray(g)).all() and (np.asarray(g) < 1.0).all()
    od2, scat2, g2 = c.liq_lindner_li(sl_lw, lwp, re)
    assert np.isfinite(np.asarray(od2)).all()
    assert (np.asarray(scat2) <= np.asarray(od2) + 1e-12).all()

    with NcFile("/root/reference/data/yi_ice_scattering_rrtm.nc") as f:
        yi_sw = f.get("coeff_sw")
    iwp = jnp.array([[0.01]])
    re_i = jnp.array([[30.0e-6]])
    od3, scat3, g3 = c.ice_yi(yi_sw, iwp, re_i)
    assert 0.1 < float(od3.max()) < 10.0
    assert (np.asarray(scat3) <= np.asarray(od3) * (1 + 1e-9)).all()
    assert (0.0 < np.asarray(g3)).all() and (np.asarray(g3) < 1.0).all()
