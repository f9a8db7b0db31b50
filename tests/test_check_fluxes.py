"""Post-run flux validation (radiation_flux.F90:117
heating_rate_out_of_physical_bounds; driver hook ecrad_driver.F90:395)."""

import io

import numpy as np

from ecrad_tpu.check import check_fluxes
from ecrad_tpu.containers import Flux


def _flux(ncol=4, nlev=10, sw_net=100.0):
    phl = np.linspace(100.0, 101325.0, nlev + 1)[None, :].repeat(ncol, 0)
    z = np.zeros((ncol, nlev + 1))
    return Flux(sw_up=z, sw_dn=z + sw_net, lw_up=z, lw_dn=z), phl


def test_clean_flux_passes():
    flux, phl = _flux()
    out = io.StringIO()
    assert not check_fluxes(flux, phl, out=out)
    assert out.getvalue() == ""


def test_nonfinite_flux_reported():
    flux, phl = _flux()
    bad = np.array(flux.sw_dn)
    bad[1, 3] = np.nan
    out = io.StringIO()
    assert check_fluxes(flux.replace(sw_dn=bad), phl, out=out)
    assert "non-finite" in out.getvalue()


def test_insane_heating_rate_reported():
    flux, phl = _flux()
    dn = np.array(flux.sw_dn)
    dn[:, -1] = 1.0e6          # huge absorption in the surface layer
    out = io.StringIO()
    assert check_fluxes(flux.replace(sw_dn=dn), phl, out=out)
    assert "heating rate" in out.getvalue()


def test_flipped_order_equivalent():
    """Surface-first profiles must validate identically
    (radiation_interface.F90 radiation_reverse semantics)."""
    flux, phl = _flux()
    dn = np.array(flux.sw_dn)
    dn[:, -1] = 1.0e6
    f = flux.replace(sw_dn=dn)
    out1, out2 = io.StringIO(), io.StringIO()
    r1 = check_fluxes(f, phl, out=out1)
    fr = f.replace(sw_up=f.sw_up[:, ::-1], sw_dn=f.sw_dn[:, ::-1],
                   lw_up=f.lw_up[:, ::-1], lw_dn=f.lw_dn[:, ::-1])
    r2 = check_fluxes(fr, phl[:, ::-1], out=out2)
    assert r1 == r2 == True  # noqa: E712
