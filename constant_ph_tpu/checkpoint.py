"""Checkpoint / exact resume (SURVEY.md §5.4).

The reference is broken-by-omission here: it overrides neither
write_restart nor restart (fix_constant_pH.h:31-40), so λ and v_λ silently
reset on a LAMMPS restart. Our SystemState pytree holds the COMPLETE
dynamic state — positions, velocities, per-site λ/v_λ, pH, thermostat
chains, RNG key, step counter — so serializing it gives bit-exact resume
(same trajectory continuation, including stochastic thermostats, because
the PRNG key is part of the state).

Format: a plain .npz of the named leaves (dependency-free, portable);
orbax users can wrap the same pytree.
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.state import SystemState


def save(path: str, state: SystemState) -> None:
    leaves = {
        f.name: np.asarray(getattr(state, f.name))
        for f in dataclasses.fields(state)
    }
    np.savez(path, **leaves)


def load(path: str, dtype=None) -> SystemState:
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    kwargs = {}
    for f in dataclasses.fields(SystemState):
        if f.name not in data.files:
            # forward-tolerant: scalar fields appended to SystemState
            # after the checkpoint was written (e.g. ext_work) restart
            # at zero — they are cumulative diagnostics, not dynamics
            kwargs[f.name] = jnp.zeros((), dtype=dtype or jnp.float32)
            continue
        arr = data[f.name]
        if f.name == "key":
            kwargs[f.name] = jnp.asarray(arr, dtype=jnp.uint32)
        elif f.name == "step":
            kwargs[f.name] = jnp.asarray(arr, dtype=jnp.int32)
        elif dtype is not None and np.issubdtype(arr.dtype, np.floating):
            kwargs[f.name] = jnp.asarray(arr, dtype=dtype)
        else:
            kwargs[f.name] = jnp.asarray(arr)
    return SystemState(**kwargs)
