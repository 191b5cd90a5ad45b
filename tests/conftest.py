"""Test harness: simulate an 8-device TPU mesh on CPU.

The reference has no multi-device tests at all (SURVEY §4); here every test
runs against 8 virtual XLA CPU devices so sharding/collective code paths are
exercised on every run.  Must set the env vars before jax imports.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # XLA:CPU collectives have hard 20s-warn/40s-terminate rendezvous
    # timeouts sized for real multi-core hosts; on this 1-core VM the 8
    # "devices" execute serially, so heavy per-device programs (rank-AP
    # over an XBM memory) stagger past 40s and the process ABORTS.
    # Raise both — correctness tests care about equivalence, not latency.
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=3600"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

# the image's site hooks force JAX_PLATFORMS=axon; the config flag wins
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {devs}"
    return devs


@pytest.fixture()
def rng():
    return np.random.RandomState(0)


@pytest.fixture(autouse=True)
def _isolate_attention_mesh():
    """The VMEM attention kernel's registered mesh is process-global state
    (ops/vmem_attention.set_attention_mesh, registered by the engine train
    loop).  A test that trains over a mesh must not leak that registration
    into later tests — the kernel raises on shapes that don't divide a
    stale mesh (observed: engine sharding tests poisoning the pure-kernel
    parity tests)."""
    yield
    from irw_tpu.ops.vmem_attention import clear_attention_mesh

    clear_attention_mesh()
