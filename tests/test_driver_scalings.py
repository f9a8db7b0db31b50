"""Cloud-perturbation driver-config keys: q_liquid_scaling,
q_ice_scaling, cloud_fraction_scaling
(driver/ecrad_driver_config.F90:165-166, applied at
ecrad_driver_read_input.F90:205-229) and do_ignore_inhom_effective_size
(ecrad_driver_config.F90:109, ecrad_driver_read_input.F90:364-371)."""

import numpy as np

from ecrad_tpu.io.input import DriverConfig, read_input
from ecrad_tpu.io.netcdf import NcWriter
from tests import golden


def test_cloud_perturbation_scalings():
    base = read_input(golden.INPUT_FILE, DriverConfig())
    dc = DriverConfig(q_liquid_scaling=0.5, q_ice_scaling=2.0,
                      cloud_fraction_scaling=0.25)
    scaled = read_input(golden.INPUT_FILE, dc)
    np.testing.assert_allclose(scaled.cloud_mixing_ratio[..., 0],
                               0.5 * base.cloud_mixing_ratio[..., 0])
    np.testing.assert_allclose(scaled.cloud_mixing_ratio[..., 1],
                               2.0 * base.cloud_mixing_ratio[..., 1])
    np.testing.assert_allclose(scaled.cloud_fraction,
                               0.25 * base.cloud_fraction)


def test_scaling_defaults_are_identity():
    """Negative (unset) and exactly-1 scalings must not copy/modify
    (ecrad_driver_read_input.F90:205: applied only when >= 0 and /= 1)."""
    base = read_input(golden.INPUT_FILE, DriverConfig())
    one = read_input(golden.INPUT_FILE, DriverConfig(
        q_liquid_scaling=1.0, q_ice_scaling=1.0,
        cloud_fraction_scaling=1.0))
    np.testing.assert_array_equal(one.cloud_mixing_ratio,
                                  base.cloud_mixing_ratio)
    np.testing.assert_array_equal(one.cloud_fraction, base.cloud_fraction)


def _write_minimal_input(path, with_inhom=True):
    ncol, nlev = 3, 4
    w = NcWriter(str(path))
    w.define_dimension("column", ncol)
    w.define_dimension("half_level", nlev + 1)
    w.define_dimension("level", nlev)
    p = np.linspace(100.0, 1.0e5, nlev + 1)[None, :].repeat(ncol, 0)
    t = np.full((ncol, nlev + 1), 280.0)
    w.write("pressure_hl", p, ("column", "half_level"))
    w.write("temperature_hl", t, ("column", "half_level"))
    w.write("inv_cloud_effective_size",
            np.full((ncol, nlev), 1e-3), ("column", "level"))
    if with_inhom:
        w.write("inv_inhom_effective_size",
                np.full((ncol, nlev), 7e-3), ("column", "level"))
    w.close()


def test_do_ignore_inhom_effective_size(tmp_path):
    path = tmp_path / "inp.nc"
    _write_minimal_input(path)
    kept = read_input(str(path), DriverConfig())
    assert kept.inv_inhom_effective_size is not None
    np.testing.assert_allclose(kept.inv_inhom_effective_size, 7e-3)
    ignored = read_input(str(path), DriverConfig(
        do_ignore_inhom_effective_size=True))
    assert ignored.inv_inhom_effective_size is None
    np.testing.assert_allclose(ignored.inv_cloud_effective_size, 1e-3)


def test_inv_effective_size_bulk_alias():
    """inv_effective_size sets all three band overrides, losing to any
    band-specific key (ecrad_driver_config.F90:338-352)."""
    dc = DriverConfig(inv_effective_size=2e-3)
    assert dc.low_inv_effective_size == 2e-3
    assert dc.middle_inv_effective_size == 2e-3
    assert dc.high_inv_effective_size == 2e-3
    dc = DriverConfig(inv_effective_size=2e-3,
                      middle_inv_effective_size=5e-3)
    assert dc.low_inv_effective_size == 2e-3
    assert dc.middle_inv_effective_size == 5e-3


def test_namelist_roundtrip(tmp_path):
    nam = tmp_path / "d.nam"
    nam.write_text(
        "&radiation_driver\n"
        "q_liquid_scaling = 0.9,\n"
        "q_ice_scaling = 1.1,\n"
        "cloud_fraction_scaling = 0.5,\n"
        "do_ignore_inhom_effective_size = true,\n"
        "/\n")
    dc = DriverConfig.from_namelist(str(nam))
    assert dc.q_liquid_scaling == 0.9
    assert dc.q_ice_scaling == 1.1
    assert dc.cloud_fraction_scaling == 0.5
    assert dc.do_ignore_inhom_effective_size is True
