"""Test harness: CPU backend with 8 virtual devices so the 2D-mesh sharded
paths run on any machine (SURVEY.md §4.5: the fake-multi-node capability the
Fortran stack never had).

Runs before any test imports jax: sets the device-count XLA flag and forces
the cpu platform (overriding the axon/TPU plugin this image registers via
sitecustomize) so tests are hermetic and fast. Benchmarks (bench.py) run on
the real chip instead.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
