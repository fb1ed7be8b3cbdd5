"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPUs via
XLA's forced host device count (see SURVEY.md §4).
Must set env vars before jax is imported anywhere.
"""
import os

# Force-override: the axon sitecustomize pins JAX_PLATFORMS=axon (real TPU);
# PALLAS_AXON_POOL_IPS must be cleared or its register() wins regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["PALLAS_AXON_POOL_IPS"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize register() sets jax_platforms="axon,cpu" in jax's
# config (stronger than env); point it back at cpu for the test mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, jax.devices()
