"""Worker process for the multi-host distributed test
(tests/test_distributed.py): one of N processes on a shared CPU
coordinator, each reading its own column slab and computing its shard.

Usage: python tests/dist_worker.py <process_id> <num_processes> <port>
<outdir>
"""

import os
import sys

proc_id = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
outdir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.config.update("jax_enable_x64", True)

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from ecrad_tpu import distributed, pipeline  # noqa: E402
from ecrad_tpu.config import Config  # noqa: E402
from ecrad_tpu.data import DATA_DIR, MERIDIAN_INPUT  # noqa: E402
from ecrad_tpu.interface import setup_radiation  # noqa: E402
from ecrad_tpu.io.input import DriverConfig  # noqa: E402


def main():
    assert distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=proc_id)
    assert jax.process_count() == nproc
    mesh = distributed.global_mesh()

    # every process: local setup (LUTs replicated by closure)
    config = Config(
        use_aerosols=False, dtype_name="float64",
        do_nearest_spectral_lw_emiss=True,
        i_lw_emiss_index=(1, 2, 1),
        lw_emiss_wavelength_bound=(8.0e-6, 13.0e-6),
        i_sw_albedo_index=(1, 2, 3, 4, 5, 6),
        sw_albedo_wavelength_bound=(0.25e-6, 0.44e-6, 0.69e-6,
                                    1.19e-6, 2.38e-6))
    config, tables = setup_radiation(config, data_dir=DATA_DIR)

    # per-host sharded read of this process's column slab
    inp, (start, stop, ncol) = distributed.read_input_distributed(
        MERIDIAN_INPUT, DriverConfig(), mesh)
    assert inp.thermodynamics.pressure_hl.shape[0] == stop - start

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
    tree = dict(
        pressure_hl=inp.thermodynamics.pressure_hl,
        temperature_hl=inp.thermodynamics.temperature_hl,
        gas_mmr=inp.gas_mmr,
        cos_sza=inp.cos_sza,
        skin_temperature=inp.skin_temperature,
        sw_albedo=inp.sw_albedo,
        sw_albedo_direct=inp.sw_albedo_direct,
        lw_emissivity=inp.lw_emissivity,
        cloud=cloud, aerosol=None)

    tree, padded = distributed.make_global_inputs(
        mesh, tree, stop - start, ncol)
    cloud_g = tree.pop("cloud")
    aerosol_g = tree.pop("aerosol")

    flux = pipeline.radiation_sharded(
        config, tables, mesh,
        solar_irradiance=float(inp.solar_irradiance),
        cloud=cloud_g, aerosol=aerosol_g, **tree)

    # per-shard output: each process keeps only its own columns
    mine = distributed.local_flux(flux, start, stop)
    np.savez(os.path.join(outdir, f"shard{proc_id}.npz"),
             start=start, stop=stop,
             lw_up=np.asarray(mine.lw_up),
             lw_dn=np.asarray(mine.lw_dn),
             sw_dn=np.asarray(mine.sw_dn),
             sw_up=np.asarray(mine.sw_up),
             cloud_cover_lw=np.asarray(mine.cloud_cover_lw))
    print(f"worker {proc_id}: ok cols [{start},{stop})", flush=True)


if __name__ == "__main__":
    main()
