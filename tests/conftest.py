"""Test harness: force an 8-device virtual CPU mesh before jax import.

The TPU-idiomatic replacement for the reference's missing distributed test
story (SURVEY.md §4): multi-chip sharding is validated on
``--xla_force_host_platform_device_count=8`` CPU devices.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize hook calls jax.config.update("jax_platforms",
# "axon,cpu") at interpreter startup, overriding the env var — re-pin to CPU
# before any backend initializes (eager ops over the axon tunnel cost ~0.5 s
# of RPC latency EACH, which makes unjitted test code pathologically slow).
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def synthetic_stl10_dir(tmp_path_factory):
    """A tiny synthetic STL-10 binary dataset (reference binary format)."""
    from ssrl_vit_mae_jepa_tpu.data.stl10 import write_synthetic_stl10

    root = tmp_path_factory.mktemp("stl10_data")
    write_synthetic_stl10(
        root, num_train=80, num_test=40, num_unlabeled=200, seed=0
    )
    return root


def scrubbed_cpu_env(**extra):
    """Subprocess env for CPU-only children: pin CPU, drop the virtual-mesh
    flag, and keep the axon sitecustomize inert (with the pool var set it
    dials the TPU relay at interpreter start — 420 s hangs when it's down).
    Single implementation for every test that spawns Python."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(extra)
    return env
