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

# XLA's cpu_aot_loader logs a benign machine-feature warning per cache hit
# (prefer-no-scatter/-gather are XLA tuning pseudo-features, not ISA bits)
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax  # noqa: E402

# The axon sitecustomize register() sets jax_platforms="axon,cpu" in jax's
# config (stronger than env); point it back at cpu for the test mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# OPT-IN persistent CPU compile cache (VIDI_TEST_CACHE=/tmp/...): warm runs
# measured ~9x faster on the generate graph (27.7 s -> 3.2 s) and cut the
# fast gate from ~12-14 min to 3m50s — but XLA:CPU's AOT serializer
# segfaulted twice (rc=139 in compilation_cache.put_executable_and_time,
# reproducibly ~35 heavy tests into a `-m slow` run on 2026-08-20; the
# cpu_aot_loader also logs machine-feature mismatches on every load), so
# it is NOT safe as the default gate. Use for local iteration only.
if os.environ.get("VIDI_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["VIDI_TEST_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert len(jax.devices()) == 8, jax.devices()
