"""Offline driver CLI, same contract as the reference:

    python -m ecrad_tpu.driver config.nam input.nc output.nc

Reference: driver/ecrad_driver.F90:28-431 (namelist → setup →
read input → radiation over all columns → save_fluxes).
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import numpy as np


def run(config_path: str, input_path: str, output_path: str,
        dtype: str = "float64", jit: bool = True, nrepeat: int = None):
    import jax
    if dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ecrad_tpu.config import Config
    from ecrad_tpu.interface import radiation, setup_radiation
    from ecrad_tpu.io.input import DriverConfig, read_input
    from ecrad_tpu.io.output import save_fluxes

    config = Config.from_namelist(config_path)
    driver_config = DriverConfig.from_namelist(config_path)
    if nrepeat is None:
        nrepeat = driver_config.nrepeat

    config, tables = setup_radiation(config)
    inp = read_input(input_path, driver_config)

    dt = jnp.float64 if dtype == "float64" else jnp.float32

    def to_dev(x):
        return jnp.asarray(x, dt) if x is not None else None

    kwargs = dict(
        pressure_hl=to_dev(inp.thermodynamics.pressure_hl),
        temperature_hl=to_dev(inp.thermodynamics.temperature_hl),
        gas_mmr=to_dev(inp.gas_mmr),
        cos_sza=to_dev(inp.cos_sza),
        skin_temperature=to_dev(inp.skin_temperature),
        sw_albedo=to_dev(inp.sw_albedo),
        sw_albedo_direct=to_dev(inp.sw_albedo_direct),
        lw_emissivity=to_dev(inp.lw_emissivity),
        solar_irradiance=float(inp.solar_irradiance),
    )

    fn = functools.partial(radiation, config, tables)
    if jit:
        fn = jax.jit(lambda **kw: radiation(config, tables, **kw))

    t0 = time.time()
    flux = fn(**kwargs)
    jax.block_until_ready(flux)
    t_first = time.time() - t0

    t0 = time.time()
    for _ in range(max(0, nrepeat - 1)):
        flux = fn(**kwargs)
        jax.block_until_ready(flux)
    t_rest = time.time() - t0

    ncol = inp.ncol
    print(f"ecrad_tpu: {ncol} columns x {inp.nlev} levels; "
          f"first call (incl. compile) {t_first:.3f}s"
          + (f"; {nrepeat-1} repeats {t_rest:.3f}s "
             f"({ncol*(nrepeat-1)/max(t_rest,1e-9):.0f} cols/s)"
             if nrepeat > 1 else ""))

    save_fluxes(output_path, config, flux, inp.thermodynamics.pressure_hl,
                experiment_name=driver_config.experiment_name,
                double_precision=driver_config.do_write_double_precision)
    return flux


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="ecrad_tpu",
        description="TPU-native ecRad-equivalent offline radiation driver")
    ap.add_argument("config")
    ap.add_argument("input")
    ap.add_argument("output")
    ap.add_argument("--dtype", default="float64",
                    choices=["float32", "float64"])
    ap.add_argument("--nrepeat", type=int, default=None)
    args = ap.parse_args(argv)
    run(args.config, args.input, args.output, dtype=args.dtype,
        nrepeat=args.nrepeat)


if __name__ == "__main__":
    main(sys.argv[1:])
