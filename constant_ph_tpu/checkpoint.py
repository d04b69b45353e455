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


# fields that may legitimately be absent from an old checkpoint and
# restart as scalar zeros (cumulative diagnostics, not dynamics). Any
# OTHER missing field is a real layout mismatch and must fail loudly.
_SCALAR_FILL_FIELDS = frozenset({"ext_work"})


def load(path: str, dtype=None) -> SystemState:
    data = np.load(path if str(path).endswith(".npz") else str(path) + ".npz")
    # fill dtype follows the checkpoint's own float precision (a float64
    # checkpoint loaded with dtype=None must not gain a float32 leaf —
    # mixed-precision pytrees break scan carries under x64)
    fill_dtype = dtype or (data["x"].dtype if "x" in data.files
                           else jnp.float32)
    kwargs = {}
    for f in dataclasses.fields(SystemState):
        if f.name not in data.files:
            if f.name not in _SCALAR_FILL_FIELDS:
                raise KeyError(
                    f"checkpoint {path} is missing non-optional field "
                    f"'{f.name}' — not a known append-after-save scalar "
                    f"({sorted(_SCALAR_FILL_FIELDS)}); refusing to "
                    f"silently zero-fill it")
            kwargs[f.name] = jnp.zeros((), dtype=fill_dtype)
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
