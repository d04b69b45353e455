"""Lennard-Jones fluid/crystal builders — the NVE foundation test system
(SURVEY.md §7.2 step 1)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from constant_ph_tpu.forcefield import (
    ForceField,
    empty_bonded,
    make_pair_params,
)
from constant_ph_tpu.neighbors import make_neighbor_params
from constant_ph_tpu.state import make_state


def lj_fluid(
    n_cells: int = 4,
    *,
    lattice_const: float = 5.40,   # Å (argon fcc ~5.26; slightly expanded)
    epsilon: float = 0.238,        # kcal/mol (argon)
    sigma: float = 3.405,          # Å
    mass: float = 39.948,          # g/mol
    cutoff: float = 8.0,
    skin: float = 2.0,
    T: float = 120.0,
    seed: int = 0,
    dtype=jnp.float32,
):
    """FCC LJ crystal: returns (ff, state, nbr_params). 4·n³ atoms."""
    a = lattice_const
    base = np.array(
        [[0, 0, 0], [0.5, 0.5, 0], [0.5, 0, 0.5], [0, 0.5, 0.5]]
    )
    cells = np.array(
        [[i, j, k] for i in range(n_cells) for j in range(n_cells)
         for k in range(n_cells)]
    )
    x = (cells[:, None, :] + base[None, :, :]).reshape(-1, 3) * a
    n = x.shape[0]
    box = np.array([n_cells * a] * 3)

    ff = ForceField(
        mass=jnp.full((n,), mass, dtype=dtype),
        q0=jnp.zeros((n,), dtype=dtype),
        type=jnp.zeros((n,), dtype=jnp.int32),
        pair=make_pair_params([epsilon], [sigma], cutoff, dtype=dtype),
        bonded=empty_bonded(dtype),
        excl_idx=jnp.full((n, 1), -1, dtype=jnp.int32),
        excl_code=jnp.zeros((n, 1), dtype=jnp.int32),
    )
    nbr_params = make_neighbor_params(box, cutoff, n_atoms=n, skin=skin)
    state = make_state(x, box=box, seed=seed, dtype=dtype)

    # Maxwell-Boltzmann velocities at T
    from constant_ph_tpu.integrators import maxwell_boltzmann
    import jax

    key = jax.random.PRNGKey(seed)
    v = maxwell_boltzmann(key, ff.mass, T, dtype=dtype)
    state = state.replace(v=v)
    return ff, state, nbr_params
