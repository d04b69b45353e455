"""SPC/E water boxes and a solvated model titratable acid.

BASELINE config 1's system family: a titratable site in SPC/E water with a
water molecule as the charge-compensation buffer (the reference's 3-atom
groupW, fix_constant_pH.cpp:42-46, and the modify_water intent,
fix_constant_pH.h:58).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.forcefield import (
    BondedParams,
    ForceField,
    build_exclusions,
    make_pair_params,
)
from constant_ph_tpu.integrators import maxwell_boltzmann
from constant_ph_tpu.lambda_dyn import make_single_site
from constant_ph_tpu.neighbors import make_neighbor_params
from constant_ph_tpu.ops.constraints import RigidTriatomic
from constant_ph_tpu.state import make_state
from constant_ph_tpu.systems.base import System

# SPC/E parameters
Q_O, Q_H = -0.8476, 0.4238
EPS_O, SIG_O = 0.15535, 3.166      # kcal/mol, Å
R_OH = 1.0
THETA_HOH = np.deg2rad(109.47)
R_HH = 2.0 * R_OH * np.sin(THETA_HOH / 2.0)
M_O, M_H, M_C = 15.9994, 1.008, 12.011

# flexible-water spring constants (SPC/Fw-style, LAMMPS E = k (r-r0)^2)
KB_OH, KA_HOH = 529.581, 37.95


def _water_geometry():
    """One water in its local frame: O at origin, H's in the xy plane."""
    h1 = np.array([R_OH, 0.0, 0.0])
    c, s = np.cos(THETA_HOH), np.sin(THETA_HOH)
    h2 = np.array([R_OH * c, R_OH * s, 0.0])
    return np.stack([np.zeros(3), h1, h2])


def _random_rotations(n, rng):
    """Uniform random rotation matrices (host-side numpy)."""
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    w, x, y, z = q.T
    return np.stack([
        np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
        np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
        np.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
    ], axis=1)


def _acid_geometry():
    """Model carboxylic acid (GLU-like headgroup): C, O1, O2, H(titratable)."""
    return np.array([
        [0.00, 0.00, 0.00],    # C
        [1.25, 0.00, 0.00],    # O1 (carbonyl)
        [-0.62, 1.10, 0.00],   # O2 (hydroxyl O)
        [-0.12, 1.95, 0.00],   # H (titratable)
    ])


# protonated / deprotonated charge sets for the model acid (net 0 → −1)
ACID_Q_PROT = np.array([0.53, -0.44, -0.53, 0.44])
ACID_Q_DEPROT = np.array([0.34, -0.67, -0.67, 0.00])
ACID_EPS = np.array([0.086, 0.21, 0.21, 0.0])    # C, O, O, H LJ ε
ACID_SIG = np.array([3.40, 2.96, 3.00, 1.0])     # σ (H has none)
ACID_MASS = np.array([M_C, 15.9994, 15.9994, M_H])


def solvated_acid(
    n_side: int = 6,
    *,
    spacing: float = 3.2,
    pK: float = 4.25,
    pH: float = 7.0,
    T: float = 300.0,
    dG_ref: float = 0.0,
    rigid_water: bool = True,
    lambda_coupled: bool = True,
    cutoff: float = 9.0,
    skin: float = 2.0,
    alpha: float = 0.0,
    coul_style: str = "cut",
    hmr: float = 1.0,
    n_buffer_waters: int = 1,
    seed: int = 0,
    dtype=jnp.float32,
) -> System:
    """A model titratable acid in a box of SPC/E water.

    ``lambda_coupled`` scales the site's Δq: False/0 ⇒ uncoupled (pure
    λ-dynamics on bias + pH term, the analytic Henderson–Hasselbalch
    configuration), True/1 ⇒ full charge change, intermediate floats reduce
    the solvent-reorganization barrier (useful for sampling studies).

    Layout: acid atoms [0..3], then waters; water 0 (atoms 4..6) is the
    charge-compensation buffer (the reference's groupW water). One lattice
    site is left empty for the acid.
    """
    rng = np.random.default_rng(seed)
    n_wat = n_side**3 - 1
    box_len = n_side * spacing
    box = np.array([box_len] * 3)

    # waters on a jittered lattice with random orientations
    sites = np.array([[i, j, k] for i in range(n_side)
                      for j in range(n_side) for k in range(n_side)],
                     dtype=np.float64)
    sites = (sites + 0.5) * spacing
    acid_site = sites[0]
    wat_sites = sites[1:]
    geo = _water_geometry() - _water_geometry().mean(axis=0)
    rots = _random_rotations(n_wat, rng)
    wat_x = wat_sites[:, None, :] + np.einsum("mij,aj->mai", rots, geo)
    # jitter per MOLECULE (rigid-body translation): per-atom jitter would
    # violate the rigid constraints at t=0
    wat_x += rng.normal(scale=0.05, size=(n_wat, 1, 3))

    acid_x = _acid_geometry() - _acid_geometry().mean(axis=0) + acid_site

    x = np.concatenate([acid_x, wat_x.reshape(-1, 3)], axis=0)
    n = x.shape[0]
    n_acid = 4

    # types: 0=C, 1=O_carb, 2=O_hydroxyl, 3=H_acid, 4=O_wat, 5=H_wat
    types = np.concatenate([
        np.array([0, 1, 2, 3]),
        np.tile(np.array([4, 5, 5]), n_wat),
    ]).astype(np.int32)
    eps = np.concatenate([ACID_EPS, [EPS_O, 0.0]])
    sig = np.concatenate([ACID_SIG, [SIG_O, 1.0]])
    acid_mass = ACID_MASS.copy()
    if hmr > 1.0:
        # hydrogen-mass repartitioning on the flexible solute O-H: borrow
        # mass from the bonded O so dt=2 fs is stable (standard HMR; total
        # mass and equilibrium ensemble unchanged)
        dm = (hmr - 1.0) * acid_mass[3]
        acid_mass[3] += dm
        acid_mass[2] -= dm
    mass = np.concatenate([acid_mass, np.tile([M_O, M_H, M_H], n_wat)])
    q0 = np.concatenate([ACID_Q_PROT, np.tile([Q_O, Q_H, Q_H], n_wat)])

    # bonds: acid C-O1, C-O2, O2-H (+ water bonds if flexible)
    acid_bonds = np.array([[0, 1], [0, 2], [2, 3]])
    wat_o = n_acid + 3 * np.arange(n_wat)
    wat_bonds = np.stack(
        [np.stack([wat_o, wat_o + 1], -1), np.stack([wat_o, wat_o + 2], -1)],
        axis=1,
    ).reshape(-1, 2)
    all_bonds = np.concatenate([acid_bonds, wat_bonds])
    excl_idx, excl_code = build_exclusions(n, np.concatenate(
        [all_bonds, np.stack([wat_o + 1, wat_o + 2], -1)]), max_excl=8)

    # bonded terms (always for the acid; waters only if flexible)
    if rigid_water:
        b_idx, b_k, b_r0 = acid_bonds, [570.0, 450.0, 553.0], [1.25, 1.25, 0.97]
        a_idx = np.array([[1, 0, 2], [0, 2, 3]])
        a_k, a_t0 = [80.0, 55.0], [np.deg2rad(126.0), np.deg2rad(113.0)]
    else:
        b_idx = np.concatenate([acid_bonds, wat_bonds])
        b_k = [570.0, 450.0, 553.0] + [KB_OH] * (2 * n_wat)
        b_r0 = [1.25, 1.25, 0.97] + [R_OH] * (2 * n_wat)
        wat_angles = np.stack([wat_o + 1, wat_o, wat_o + 2], -1)
        a_idx = np.concatenate([np.array([[1, 0, 2], [0, 2, 3]]), wat_angles])
        a_k = [80.0, 55.0] + [KA_HOH] * n_wat
        a_t0 = [np.deg2rad(126.0), np.deg2rad(113.0)] + [THETA_HOH] * n_wat

    nb = len(b_idx)
    na = len(a_idx)
    bonded = BondedParams(
        bond_idx=jnp.asarray(np.asarray(b_idx, dtype=np.int32)),
        bond_k=jnp.asarray(np.asarray(b_k), dtype=dtype),
        bond_r0=jnp.asarray(np.asarray(b_r0), dtype=dtype),
        bond_mask=jnp.ones((nb,), dtype=dtype),
        angle_idx=jnp.asarray(np.asarray(a_idx, dtype=np.int32)),
        angle_k=jnp.asarray(np.asarray(a_k), dtype=dtype),
        angle_t0=jnp.asarray(np.asarray(a_t0), dtype=dtype),
        angle_mask=jnp.ones((na,), dtype=dtype),
        dihedral_idx=jnp.zeros((0, 4), dtype=jnp.int32),
        dihedral_k=jnp.zeros((0,), dtype=dtype),
        dihedral_n=jnp.zeros((0,), dtype=dtype),
        dihedral_d=jnp.zeros((0,), dtype=dtype),
        dihedral_mask=jnp.zeros((0,), dtype=dtype),
        improper_idx=jnp.zeros((0, 4), dtype=jnp.int32),
        improper_k=jnp.zeros((0,), dtype=dtype),
        improper_x0=jnp.zeros((0,), dtype=dtype),
        improper_mask=jnp.zeros((0,), dtype=dtype),
    )

    ff = ForceField(
        mass=jnp.asarray(mass, dtype=dtype),
        q0=jnp.asarray(q0, dtype=dtype),
        type=jnp.asarray(types),
        pair=make_pair_params(
            eps, sig, cutoff, alpha=alpha, coul_style=coul_style,
            special_lj=(1.0, 0.0, 0.0, 0.5),
            special_coul=(1.0, 0.0, 0.0, 0.8333),
            dtype=dtype,
        ),
        bonded=bonded,
        excl_idx=jnp.asarray(excl_idx),
        excl_code=jnp.asarray(excl_code),
    )

    # λ site: acid atoms + buffer water(s). With n_buffer_waters == 1 the
    # first water (atoms 4,5,6) carries the full compensating +1e (the
    # reference's literal 3-atom groupW, fix_constant_pH.cpp:42-46); with
    # N > 1 the charge spreads +1/(3N) per atom over N scattered waters —
    # solvent reorganization scales as Σdq² and the single-buffer layout
    # costs a measured 20.4 kcal/mol mid-λ PMF barrier at full Δq
    # (examples/results/buffer_barrier_probe.json).
    dq_scale = float(lambda_coupled)
    if n_buffer_waters > n_wat:
        raise ValueError(
            f"need {n_buffer_waters} buffer waters, only {n_wat} available")
    if n_buffer_waters == 1:
        bufs = np.array([0])
    else:
        bufs = np.sort(
            np.random.default_rng(seed + 1).permutation(n_wat)
            [:n_buffer_waters])
    buf_o = n_acid + 3 * bufs
    spec = make_single_site(
        atom_idx=[0, 1, 2, 3],
        q_prot=ACID_Q_PROT,
        q_deprot=(ACID_Q_PROT + (ACID_Q_DEPROT - ACID_Q_PROT) * dq_scale),
        pK=pK,
        buffer_idx=np.stack([buf_o, buf_o + 1, buf_o + 2], -1).reshape(-1),
        dG_ref=dG_ref,
        dtype=dtype,
    )

    constraints = None
    if rigid_water:
        trip = np.stack([wat_o, wat_o + 1, wat_o + 2], axis=-1)
        constraints = RigidTriatomic(trip, mass, R_OH, R_HH)

    nbr_params = make_neighbor_params(box, cutoff, n_atoms=n, skin=skin)
    state = make_state(
        x, box=box, lam=[0.5], pH=pH, seed=seed, dtype=dtype
    )
    key = jax.random.PRNGKey(seed + 1)
    state = state.replace(v=maxwell_boltzmann(key, ff.mass, T, dtype=dtype))

    groupH_mask = jnp.zeros((n,), dtype=bool).at[3].set(True)
    return System(
        ff=ff, state=state, nbr_params=nbr_params, bonded=bonded,
        constraints=constraints, spec=spec, groupH_mask=groupH_mask,
    )


def water_box(n_side: int = 6, *, rigid: bool = True, T: float = 300.0,
              cutoff: float = 9.0, seed: int = 0, **kw) -> System:
    """Pure SPC/E water box (no titratable site)."""
    sys = solvated_acid(n_side=n_side, rigid_water=rigid, T=T,
                        cutoff=cutoff, seed=seed, lambda_coupled=False, **kw)
    return sys
