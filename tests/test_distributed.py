"""Multi-host distributed execution (SURVEY §2.5 P4): two real
processes on a shared coordinator, per-host sharded NetCDF reads,
global column-sharded compute, per-shard output — fluxes must equal
the single-process run exactly.

Also covers the single-process utilities: column_slab math and the
col_range sharded reader.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_col_range_reader_matches_full():
    from ecrad_tpu.data import MERIDIAN_INPUT
    from ecrad_tpu.io.input import read_input

    full = read_input(MERIDIAN_INPUT)
    part = read_input(MERIDIAN_INPUT, col_range=(8, 20))
    np.testing.assert_array_equal(
        part.thermodynamics.pressure_hl,
        full.thermodynamics.pressure_hl[8:20])
    np.testing.assert_array_equal(part.gas_mmr, full.gas_mmr[8:20])
    np.testing.assert_array_equal(part.iseed, full.iseed[8:20])
    np.testing.assert_array_equal(part.cloud_fraction,
                                  full.cloud_fraction[8:20])
    # non-column variables (LUT-like scalars) unchanged
    assert part.solar_irradiance == full.solar_irradiance


def test_column_slab_partition():
    import jax
    from ecrad_tpu import distributed

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("columns",))
    start, stop, padded = distributed.column_slab(mesh, 30)
    # single process: owns everything; padded to 32
    assert (start, stop) == (0, 30) and padded == 32


def test_two_process_distributed_run():
    """Spawn 2 coordinated CPU processes (2 devices each); compare the
    concatenated per-shard fluxes against a single-process run."""
    port = _free_port()
    with tempfile.TemporaryDirectory() as outdir:
        procs = [subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "dist_worker.py"),
             str(i), "2", str(port), outdir],
            cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True) for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=900)
            outs.append(out)
        for i, p in enumerate(procs):
            assert p.returncode == 0, \
                f"worker {i} failed:\n{outs[i][-4000:]}"

        shards = [np.load(os.path.join(outdir, f"shard{i}.npz"))
                  for i in range(2)]

    # boundaries tile the column range
    assert shards[0]["start"] == 0
    assert shards[1]["start"] == shards[0]["stop"]

    # single-process reference on the same configuration
    import jax
    from ecrad_tpu import pipeline
    from ecrad_tpu.config import Config
    from ecrad_tpu.data import DATA_DIR, MERIDIAN_INPUT
    from ecrad_tpu.interface import setup_radiation
    from ecrad_tpu.io.input import DriverConfig, read_input

    config = Config(
        use_aerosols=False, dtype_name="float64",
        do_nearest_spectral_lw_emiss=True,
        i_lw_emiss_index=(1, 2, 1),
        lw_emiss_wavelength_bound=(8.0e-6, 13.0e-6),
        i_sw_albedo_index=(1, 2, 3, 4, 5, 6),
        sw_albedo_wavelength_bound=(0.25e-6, 0.44e-6, 0.69e-6,
                                    1.19e-6, 2.38e-6))
    config, tables = setup_radiation(config, data_dir=DATA_DIR)
    inp = read_input(MERIDIAN_INPUT, DriverConfig())
    cloud = {
        "fraction": inp.cloud_fraction,
        "q_liq": inp.cloud_mixing_ratio[:, :, 0],
        "q_ice": inp.cloud_mixing_ratio[:, :, 1],
        "re_liq": inp.cloud_effective_radius[:, :, 0],
        "re_ice": inp.cloud_effective_radius[:, :, 1],
        "overlap_param": inp.overlap_param,
        "fractional_std": inp.fractional_std,
        "iseed": inp.iseed,
    }
    flux = pipeline.radiation_step(
        config, tables, solar_irradiance=float(inp.solar_irradiance),
        cloud=cloud, aerosol=None,
        pressure_hl=inp.thermodynamics.pressure_hl,
        temperature_hl=inp.thermodynamics.temperature_hl,
        gas_mmr=inp.gas_mmr, cos_sza=inp.cos_sza,
        skin_temperature=inp.skin_temperature,
        sw_albedo=inp.sw_albedo, sw_albedo_direct=inp.sw_albedo_direct,
        lw_emissivity=inp.lw_emissivity)
    jax.block_until_ready(flux)

    for field in ("lw_up", "lw_dn", "sw_dn", "sw_up",
                  "cloud_cover_lw"):
        got = np.concatenate([np.asarray(s[field]) for s in shards],
                             axis=0)
        ref = np.asarray(getattr(flux, field))
        np.testing.assert_allclose(got, ref, rtol=1e-12, atol=1e-12,
                                   err_msg=field)
