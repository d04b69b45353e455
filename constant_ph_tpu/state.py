"""SystemState: the TPU-native atom store.

The reference rides on LAMMPS's Atom class (growable x/v/f/q/mask arrays,
nlocal/nghost/nmax bookkeeping — consumed at fix_constant_pH.cpp:100,
151-153, 188, 200-208). The TPU-native equivalent (SURVEY.md §2.3.1) is a
single fixed-shape pytree of HBM-resident device arrays: capacity is a
static pad, validity masks replace nlocal, and "growing" is a retrace, not
a realloc.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SystemState:
    """Dynamic state of the simulation — everything a checkpoint must hold.

    The explicit per-site λ state here is what the reference loses on
    restart (it overrides neither write_restart nor restart,
    fix_constant_pH.h:31-40 — SURVEY.md §5.4); serializing this pytree is
    exact resume.
    """

    x: jax.Array          # (N, 3) positions, Å
    v: jax.Array          # (N, 3) velocities, Å/fs
    box: jax.Array        # (3,) orthorhombic box lengths, Å
    lam: jax.Array        # (S,) per-site λ (ref: scalar `lambda`,
                          #  fix_constant_pH.cpp:115)
    v_lam: jax.Array      # (S,) λ velocities (ref: `v_lambda`, :116)
    step: jax.Array       # () int32 timestep (ref: update->ntimestep)
    key: jax.Array        # PRNG key (thermostats / replica exchange)
    pH: jax.Array         # () imposed pH — dynamic (replica exchange swaps it)
    # Nosé–Hoover chain state (zeros when unused)
    nhc_xi: jax.Array     # (M,) atom-thermostat chain velocities
    nhc_lam_xi: jax.Array # (M,) λ-thermostat chain velocities
    # () cumulative NON-Hamiltonian energy injected into the system:
    # thermostat velocity scalings (NHC + Langevin O-steps, atoms and λ)
    # and metadynamics hill deposits. Subtracting it makes h_conserved a
    # valid conservation oracle in EVERY mode (the reference's H_λ is
    # exactly such a diagnostic, fix_constant_pH.cpp:114), not just NVE.
    ext_work: jax.Array


def make_state(
    x,
    v=None,
    box=None,
    lam=None,
    v_lam=None,
    pH: float = 7.0,
    seed: int = 0,
    nhc_len: int = 3,
    dtype=jnp.float32,
) -> SystemState:
    x = jnp.asarray(x, dtype=dtype)
    n = x.shape[0]
    if v is None:
        v = jnp.zeros_like(x)
    if lam is None:
        lam = jnp.zeros((0,), dtype=dtype)
    lam = jnp.asarray(lam, dtype=dtype)
    if v_lam is None:
        v_lam = jnp.zeros_like(lam)
    return SystemState(
        x=x,
        v=jnp.asarray(v, dtype=dtype),
        box=jnp.asarray(box, dtype=dtype),
        lam=lam,
        v_lam=jnp.asarray(v_lam, dtype=dtype),
        step=jnp.array(0, dtype=jnp.int32),
        key=jax.random.PRNGKey(seed),
        pH=jnp.asarray(pH, dtype=dtype),
        nhc_xi=jnp.zeros((nhc_len,), dtype=dtype),
        nhc_lam_xi=jnp.zeros((nhc_len,), dtype=dtype),
        ext_work=jnp.zeros((), dtype=dtype),
    )


def min_image(dx: jax.Array, box: jax.Array) -> jax.Array:
    """Minimum-image displacement for an orthorhombic box."""
    return dx - box * jnp.round(dx / box)


def wrap(x: jax.Array, box: jax.Array) -> jax.Array:
    """Wrap positions into [0, box)."""
    return x - box * jnp.floor(x / box)
