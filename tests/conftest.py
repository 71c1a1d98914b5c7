"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests exercise a real Mesh without TPU hardware. Must run before jax import.
"""

import os
import sys
from pathlib import Path

# Tests always run on the virtual-8-device CPU platform, regardless of
# the shell's axon/TPU environment (background shells lack the axon
# plugin path, so never inherit JAX_PLATFORMS=axon here).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Make the repo importable no matter how pytest was invoked.
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

# dryrun_multichip re-execs itself into a CPU-forced subprocess unless
# this marker is set; under pytest the platform is already forced, so
# run it in-process (the subprocess path has its own slow-marked test).
os.environ["_QPWCNET_DRYRUN_CHILD"] = "1"

import jax  # noqa: E402

# The axon sitecustomize sets jax_platforms='axon,cpu' programmatically
# at interpreter start, overriding the env var — force CPU back here
# (before any backend is initialized).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
# Persistent compile cache: full-model CPU compiles take minutes on this
# 1-core host; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/qpwcnet_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import pytest  # noqa: E402

# Small-but-valid model size (multiples of 32) shared by model/train tests.
TEST_HW = (32, 64)


@pytest.fixture(scope="session")
def flow_setup():
    from qpwcnet_tpu.models import build_flow_net

    model, variables = build_flow_net(jax.random.key(0), TEST_HW,
                                      cv_impl="xla")
    return model, variables


@pytest.fixture(scope="session")
def interp_setup():
    from qpwcnet_tpu.models import build_interpolator

    model, variables = build_interpolator(jax.random.key(1), TEST_HW,
                                          cv_impl="xla")
    return model, variables
