"""Integrators and thermostats.

The host-engine services the reference presumes (SURVEY.md §2.3.12): a
velocity-Verlet integrator moving the atoms and thermostats maintaining the
target temperature — plus the λ analogs (a separate λ thermostat is
BASELINE config 2). All pure functions designed to live inside one jitted
step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from constant_ph_tpu import units


def kinetic_energy(v, mass):
    """½ Σ m v² in kcal/mol (v in Å/fs, m in g/mol)."""
    return 0.5 * units.MVV2E * jnp.sum(mass * jnp.sum(v * v, axis=-1))


def temperature(v, mass, ndof=None):
    ke = kinetic_energy(v, mass)
    if ndof is None:
        ndof = 3 * v.shape[0]
    return 2.0 * ke / (ndof * units.BOLTZ)


def maxwell_boltzmann(key, mass, T, dtype=jnp.float32, zero_momentum=True):
    """Draw velocities from the MB distribution at temperature T."""
    n = mass.shape[0]
    sigma = jnp.sqrt(units.BOLTZ * T / (mass * units.MVV2E))[:, None]
    v = sigma * jax.random.normal(key, (n, 3), dtype=dtype)
    if zero_momentum:
        p = jnp.sum(mass[:, None] * v, axis=0) / jnp.sum(mass)
        v = v - p[None, :]
    return v.astype(dtype)


# ---------------------------------------------------------------------------
# Langevin (BAOAB splitting) — the robust sampling thermostat. The "O" step
# here; B/A steps are the engine's usual kick/drift.
# ---------------------------------------------------------------------------

def langevin_o_step(key, v, mass, T, gamma, dt):
    """Ornstein–Uhlenbeck exact update: v ← c1 v + c2 ξ.

    gamma in 1/fs. Works for any trailing shape with mass broadcastable.
    """
    c1 = jnp.exp(-gamma * dt)
    sigma2 = units.BOLTZ * T / (mass * units.MVV2E)
    c2 = jnp.sqrt((1.0 - c1 * c1) * sigma2)
    noise = jax.random.normal(key, v.shape, dtype=v.dtype)
    if v.ndim == 2:
        return c1 * v + c2[:, None] * noise
    return c1 * v + c2 * noise


# ---------------------------------------------------------------------------
# Nosé–Hoover chains (MTK), operating through a velocity scale factor.
# ---------------------------------------------------------------------------

def nhc_halfstep(xi, ke2, ndof, kT, tau, dt):
    """Advance an M-link Nosé–Hoover chain a half step; return (scale, xi').

    xi: (M,) chain "velocities" (1/fs). ke2 = 2·KE of the coupled DOFs
    (kcal/mol). Q1 = ndof·kT·τ², Qk = kT·τ². Single Suzuki–Yoshida step with
    the standard symmetric update; adequate for τ ≫ dt.
    """
    M = xi.shape[0]
    Q = jnp.concatenate(
        [jnp.array([ndof * kT * tau * tau], dtype=xi.dtype),
         jnp.full((M - 1,), kT * tau * tau, dtype=xi.dtype)]
    )
    dt2 = 0.5 * dt
    dt4 = 0.25 * dt

    # forces on chain links
    def G(k, ke2_now, xi_now):
        prev_ke2 = jnp.where(
            k == 0, ke2_now, Q[jnp.maximum(k - 1, 0)] * xi_now[jnp.maximum(k - 1, 0)] ** 2
        )
        target = jnp.where(k == 0, ndof * kT, kT)
        return (prev_ke2 - target) / Q[k]

    # update chain from the tail inward
    def tail_update(xi_now, ke2_now):
        for k in range(M - 1, -1, -1):
            g = G(k, ke2_now, xi_now)
            if k == M - 1:
                xi_now = xi_now.at[k].add(dt4 * g)
            else:
                f = jnp.exp(-dt4 * 0.5 * xi_now[k + 1])
                xi_now = xi_now.at[k].set(f * (f * xi_now[k] + dt4 * g))
        return xi_now

    xi = tail_update(xi, ke2)
    scale = jnp.exp(-dt2 * xi[0])
    ke2 = ke2 * scale * scale
    xi_new = xi
    for k in range(M):
        g = G(k, ke2, xi_new)
        if k == M - 1:
            xi_new = xi_new.at[k].add(dt4 * g)
        else:
            f = jnp.exp(-dt4 * 0.5 * xi_new[k + 1])
            xi_new = xi_new.at[k].set(f * (f * xi_new[k] + dt4 * g))
    return scale, xi_new


def nhc_energy(xi, ndof, kT, tau, eta=None):
    """Thermostat contribution to the conserved quantity (kinetic part).

    Note: the full NHC conserved quantity also needs the chain positions η;
    we track only ½Q ξ² here and expose η via the engine when requested.
    """
    M = xi.shape[0]
    Q = jnp.concatenate(
        [jnp.array([ndof * kT * tau * tau], dtype=xi.dtype),
         jnp.full((M - 1,), kT * tau * tau, dtype=xi.dtype)]
    )
    return 0.5 * jnp.sum(Q * xi * xi)
