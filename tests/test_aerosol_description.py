"""Aerosol optics metadata registry
(radiation_aerosol_optics_description.F90; test shape:
driver/test_aerosol_optics_description.F90)."""

import io

import pytest

from ecrad_tpu.data import DATA_DIR, find_data_file
from ecrad_tpu.optics.aerosol_description import (
    AerosolOpticsDescription, resolve_aerosol_type_names)

FILE = find_data_file(DATA_DIR, "aerosol_ifs_49R1_20230119.nc")


@pytest.fixture(scope="module")
def desc():
    return AerosolOpticsDescription.read(FILE)


def test_read_metadata(desc):
    assert len(desc.code_phobic) > 0
    assert len(desc.code_philic) > 0
    assert all(len(c) == 2 for c in desc.code_phobic if c)
    # known families present (aerosol_ifs_49R1 contents)
    assert "DD" in desc.code_phobic
    assert "SS" in desc.code_philic


def test_ambiguous_without_model(desc):
    """Multiple DD entries → ambiguity warning, first match returned
    (reference scoring semantics)."""
    out = io.StringIO()
    idx = desc.get_index("DD", False, out=out)
    assert idx > 0
    assert "unambiguously" in out.getvalue()


def test_bin_and_model_selection(desc):
    i_nomodel = desc.get_index("DD", False, bin=2)
    models = {desc.model_phobic[i - 1]
              for i, c in enumerate(desc.code_phobic, 1) if c == "DD"}
    assert len(models) > 1         # file offers competing DD models
    # an explicit model disambiguates
    some_model = sorted(models)[0]
    i_model = desc.get_index("DD", False, bin=2,
                             optical_model=some_model)
    assert i_model > 0
    assert desc.model_phobic[i_model - 1] == some_model
    assert desc.bin_phobic[i_model - 1] == 2
    assert i_nomodel > 0


def test_preferred_optical_model(desc):
    d = AerosolOpticsDescription.read(FILE)
    models = sorted({d.model_phobic[i - 1]
                     for i, c in enumerate(d.code_phobic, 1)
                     if c == "DD"})
    target = models[-1]
    d.preferred_optical_model("DD", target)
    out = io.StringIO()
    idx = d.get_index("DD", False, bin=2, out=out)
    assert idx > 0
    assert d.model_phobic[idx - 1] == target
    assert "unambiguously" not in out.getvalue()


def test_no_match_returns_zero(desc):
    assert desc.get_index("DD", False, optical_model="Nobody") == 0
    with pytest.raises(ValueError):
        AerosolOpticsDescription.read(FILE).preferred_optical_model(
            "DD", "Nobody")


def test_philic_negative_index(desc):
    idx = desc.get_index("SS", True, bin=1)
    assert idx < 0
    assert desc.code_philic[-idx - 1] == "SS"


def test_resolve_type_names():
    m = resolve_aerosol_type_names(
        ("SS,bin=1,philic", "DD,bin=2,phobic", "XX"), FILE)
    assert len(m) == 3
    assert m[0] < 0 and m[1] > 0 and m[2] == 0


def test_config_setup_with_names():
    """A Config using aerosol_type_name resolves to the same tables as
    the equivalent integer map (setup-time parity)."""
    from ecrad_tpu.config import Config
    from ecrad_tpu.interface import setup_radiation

    names = ("SS,bin=1,philic", "DD,bin=2,phobic")
    c1 = Config(use_aerosols=True, aerosol_type_name=names,
                use_general_cloud_optics=False)
    c1, t1 = setup_radiation(c1, data_dir=DATA_DIR)
    expected = resolve_aerosol_type_names(names, FILE)
    assert c1.i_aerosol_type_map == expected
    assert c1.n_aerosol_types == 2

    c2 = Config(use_aerosols=True, n_aerosol_types=2,
                i_aerosol_type_map=expected,
                use_general_cloud_optics=False)
    c2, t2 = setup_radiation(c2, data_dir=DATA_DIR)
    assert c2.i_aerosol_type_map == c1.i_aerosol_type_map
