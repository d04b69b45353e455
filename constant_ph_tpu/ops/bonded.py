"""Bonded interactions: harmonic bonds/angles, CHARMM dihedrals, impropers.

The tally sources of the reference's compute_Hs sweeps
(force->bond/angle/dihedral/improper->eatom, fix_constant_pH.cpp:221-239).
Energies are computed from positions with min-image displacements; forces
come from jax.grad (exact, and the backward scatter-adds are tiny at bonded
counts), and per-atom energies are distributed evenly among the term's atoms
— the LAMMPS eatom convention.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from constant_ph_tpu.forcefield import BondedParams
from constant_ph_tpu.state import min_image


def _bond_energies(x, box, bp: BondedParams):
    xi = x[bp.bond_idx[:, 0]]
    xj = x[bp.bond_idx[:, 1]]
    dx = min_image(xi - xj, box)
    r = jnp.sqrt(jnp.sum(dx * dx, axis=-1) + 1e-12)
    return bp.bond_k * (r - bp.bond_r0) ** 2 * bp.bond_mask


def _angle_energies(x, box, bp: BondedParams):
    xi = x[bp.angle_idx[:, 0]]
    xj = x[bp.angle_idx[:, 1]]   # vertex
    xk = x[bp.angle_idx[:, 2]]
    r1 = min_image(xi - xj, box)
    r2 = min_image(xk - xj, box)
    cross = jnp.cross(r1, r2)
    sin_t = jnp.sqrt(jnp.sum(cross * cross, axis=-1) + 1e-12)
    cos_t = jnp.sum(r1 * r2, axis=-1)
    theta = jnp.arctan2(sin_t, cos_t)
    return bp.angle_k * (theta - bp.angle_t0) ** 2 * bp.angle_mask


def _dihedral_angle(x, box, idx):
    """Proper dihedral φ about the j-k axis (standard atan2 form)."""
    xi, xj, xk, xl = (x[idx[:, 0]], x[idx[:, 1]], x[idx[:, 2]], x[idx[:, 3]])
    b1 = min_image(xj - xi, box)
    b2 = min_image(xk - xj, box)
    b3 = min_image(xl - xk, box)
    n1 = jnp.cross(b1, b2)
    n2 = jnp.cross(b2, b3)
    b2n = jnp.sqrt(jnp.sum(b2 * b2, axis=-1) + 1e-12)
    m1 = jnp.cross(n1, b2 / b2n[:, None])
    xcomp = jnp.sum(n1 * n2, axis=-1)
    ycomp = jnp.sum(m1 * n2, axis=-1)
    return jnp.arctan2(ycomp, xcomp)


def _dihedral_energies(x, box, bp: BondedParams):
    phi = _dihedral_angle(x, box, bp.dihedral_idx)
    return (
        bp.dihedral_k
        * (1.0 + jnp.cos(bp.dihedral_n * phi - bp.dihedral_d))
        * bp.dihedral_mask
    )


def _improper_energies(x, box, bp: BondedParams):
    chi = _dihedral_angle(x, box, bp.improper_idx)
    # harmonic improper with periodic wrap of (chi - chi0) into [-pi, pi]
    d = chi - bp.improper_x0
    d = d - 2.0 * jnp.pi * jnp.round(d / (2.0 * jnp.pi))
    return bp.improper_k * d * d * bp.improper_mask


def bonded_energy(x, box, bp: BondedParams):
    """Total + per-term bonded energies."""
    eb = jnp.sum(_bond_energies(x, box, bp))
    ea = jnp.sum(_angle_energies(x, box, bp))
    ed = jnp.sum(_dihedral_energies(x, box, bp))
    ei = jnp.sum(_improper_energies(x, box, bp))
    return eb + ea + ed + ei, (eb, ea, ed, ei)


def bonded_forces(x, box, bp: BondedParams):
    """(E_total, F = −∇E, eatom) for all bonded terms."""
    n = x.shape[0]

    def total(xx):
        e, _ = bonded_energy(xx, box, bp)
        return e

    e_total, grad = jax.value_and_grad(total)(x)
    force = -grad

    # per-atom tally: split each term's energy evenly among its atoms
    eatom = jnp.zeros((n,), dtype=x.dtype)
    eb = _bond_energies(x, box, bp)
    for c in range(2):
        eatom = eatom.at[bp.bond_idx[:, c]].add(0.5 * eb)
    ea = _angle_energies(x, box, bp)
    for c in range(3):
        eatom = eatom.at[bp.angle_idx[:, c]].add(ea / 3.0)
    ed = _dihedral_energies(x, box, bp)
    for c in range(4):
        eatom = eatom.at[bp.dihedral_idx[:, c]].add(0.25 * ed)
    ei = _improper_energies(x, box, bp)
    for c in range(4):
        eatom = eatom.at[bp.improper_idx[:, c]].add(0.25 * ei)
    return e_total, force, eatom


def make_bonded_fn(bp: BondedParams):
    """Engine hook: (x, box) -> (E, F, eatom)."""
    def fn(x, box):
        return bonded_forces(x, box, bp)
    return fn
