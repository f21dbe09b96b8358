"""Test fixtures: run all tests on a simulated 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere (SURVEY §4 test plan).
"""

import os

# force CPU: the ambient environment pins JAX_PLATFORMS to the real TPU
# (axon); tests must run on the simulated 8-device CPU mesh instead.
if os.environ.get("MACAW_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

if os.environ.get("MACAW_TEST_TPU") != "1":
    # the axon sitecustomize hard-sets jax_platforms="axon,cpu" via
    # jax.config at interpreter start; override it back to cpu-only so
    # the 8-device simulated mesh is what tests see.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu" or \
    os.environ.get("MACAW_TEST_TPU") == "1"
