"""Test harness config: force an 8-device virtual CPU mesh.

This is the TPU analog of LAMMPS's MPI rank-parity testing (SURVEY.md §4 item
5): the same physics must hold on 1 device and on a sharded 8-device mesh, so
tests run on CPU with `xla_force_host_platform_device_count=8` as the "fake
backend"; the driver separately dry-run-compiles the multi-chip path and
benches on the real chip.

Note: the environment's sitecustomize registers the axon TPU backend at
interpreter start and sets jax_platforms="axon,cpu", so plain env vars are
not enough — we must override the jax config before any backend initializes.
Routing unit tests through the remote-TPU tunnel would make every tiny jit a
multi-second remote compile.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
