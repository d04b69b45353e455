"""Synthetic solvated polypeptide with many coupled titratable sites.

BASELINE config 4's system family (HEWL-scale, ~25k atoms, multi-site
titration). With zero network egress there is no PDB to read, so the
builder generates a protein-LIKE system procedurally: a coarse
backbone chain (bonds/angles/dihedrals) carrying carboxylate side-chain
headgroups (C, O1, O2, titratable H — the same model chemistry as
systems.water.solvated_acid), solvated in SPC/E water with one buffer
water per site (the reference's 3-atom groupW per titratable site,
fix_constant_pH.cpp:42-46). Real systems can be loaded through
systems.lammps_data instead.
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
from constant_ph_tpu.lambda_dyn import make_single_site, stack_sites
from constant_ph_tpu.neighbors import make_neighbor_params
from constant_ph_tpu.ops.constraints import RigidTriatomic
from constant_ph_tpu.state import make_state
from constant_ph_tpu.systems.base import System
from constant_ph_tpu.systems.water import (
    ACID_EPS,
    ACID_MASS,
    ACID_Q_DEPROT,
    ACID_Q_PROT,
    ACID_SIG,
    EPS_O,
    M_H,
    M_O,
    Q_H,
    Q_O,
    R_HH,
    R_OH,
    SIG_O,
    _acid_geometry,
    _random_rotations,
    _water_geometry,
)


def solvated_polypeptide(
    n_residues: int = 32,
    sites_every: int = 2,
    box_len: float = 62.0,
    *,
    water_spacing: float = 3.15,
    pKs=(4.25, 3.65, 6.5),
    pH: float = 7.0,
    T: float = 300.0,
    dq_scale: float = 1.0,
    n_buffer_waters: int = 1,
    cutoff: float = 9.0,
    skin: float = 2.0,
    alpha: float = 0.0,
    coul_style: str = "dsf",
    seed: int = 0,
    dtype=jnp.float32,
) -> System:
    """Build the multi-site solvated system. Returns a System whose spec has
    n_residues//sites_every titratable λ sites with per-site pK cycling
    through ``pKs`` and per-site buffer waters."""
    rng = np.random.default_rng(seed)

    # ---- backbone: a loose helix through the box center ----
    t = np.arange(n_residues) * 0.6
    radius = 6.5
    bb = np.stack([
        radius * np.cos(t), radius * np.sin(t), 1.9 * t
    ], axis=-1)
    bb += box_len / 2 - bb.mean(axis=0)

    atoms_x, atoms_t, atoms_q, atoms_m = [], [], [], []
    bonds, angles, dihedrals = [], [], []
    # types: 0 CA, 1 C(acid), 2 O1, 3 O2, 4 H(acid), 5 O(wat), 6 H(wat)
    CA, AC, AO1, AO2, AH, WO, WH = range(7)

    def add_atom(x, ty, q, m):
        atoms_x.append(x)
        atoms_t.append(ty)
        atoms_q.append(q)
        atoms_m.append(m)
        return len(atoms_x) - 1

    ca_ids = []
    site_atoms = []   # (C, O1, O2, H) per titratable residue
    for r in range(n_residues):
        ca = add_atom(bb[r], CA, 0.0, 12.011)
        ca_ids.append(ca)
        if r > 0:
            bonds.append((ca_ids[r - 1], ca, 250.0, 3.80))
        if r > 1:
            angles.append((ca_ids[r - 2], ca_ids[r - 1], ca, 40.0,
                           np.deg2rad(110.0)))
        if r > 2:
            dihedrals.append((ca_ids[r - 3], ca_ids[r - 2],
                              ca_ids[r - 1], ca, 0.6, 3.0, 0.0))
        if r % sites_every == 0:
            # attach a carboxylate headgroup, displaced radially outward
            outward = bb[r] - [box_len / 2, box_len / 2, bb[r][2]]
            outward[2] = 0.0
            outward /= max(np.linalg.norm(outward), 1e-6)
            geo = _acid_geometry() - _acid_geometry()[0]
            base = bb[r] + outward * 2.6
            ids = []
            for a in range(4):
                ids.append(add_atom(
                    base + geo[a],
                    (AC, AO1, AO2, AH)[a],
                    ACID_Q_PROT[a],
                    ACID_MASS[a],
                ))
            bonds.append((ca, ids[0], 200.0, 2.6))
            bonds.append((ids[0], ids[1], 570.0, 1.25))
            bonds.append((ids[0], ids[2], 450.0, 1.25))
            bonds.append((ids[2], ids[3], 553.0, 0.97))
            angles.append((ids[1], ids[0], ids[2], 80.0, np.deg2rad(126.0)))
            angles.append((ids[0], ids[2], ids[3], 55.0, np.deg2rad(113.0)))
            angles.append((ca, ids[0], ids[1], 45.0, np.deg2rad(120.0)))
            site_atoms.append(ids)

    n_prot = len(atoms_x)
    prot_x = np.array(atoms_x)

    # ---- solvate: water lattice, drop sites overlapping the protein ----
    n_side = int(np.floor(box_len / water_spacing))
    spacing = box_len / n_side
    sites = (np.array(
        [[i, j, k] for i in range(n_side) for j in range(n_side)
         for k in range(n_side)], dtype=np.float64) + 0.5) * spacing
    d2 = ((sites[:, None, :] - prot_x[None, :, :]) ** 2).sum(-1).min(axis=1)
    sites = sites[d2 > 3.0**2]
    n_wat = sites.shape[0]
    geo = _water_geometry() - _water_geometry().mean(axis=0)
    rots = _random_rotations(n_wat, rng)
    wat_x = sites[:, None, :] + np.einsum("mij,aj->mai", rots, geo)
    wat_x += rng.normal(scale=0.04, size=(n_wat, 1, 3))

    x = np.concatenate([prot_x, wat_x.reshape(-1, 3)])
    n = x.shape[0]
    wat_o = n_prot + 3 * np.arange(n_wat)

    types = np.concatenate([
        np.array(atoms_t), np.tile([WO, WH, WH], n_wat)
    ]).astype(np.int32)
    q0 = np.concatenate([np.array(atoms_q), np.tile([Q_O, Q_H, Q_H], n_wat)])
    mass = np.concatenate([np.array(atoms_m), np.tile([M_O, M_H, M_H], n_wat)])

    eps = np.array([0.10, ACID_EPS[0], ACID_EPS[1], ACID_EPS[2], 0.0,
                    EPS_O, 0.0])
    sig = np.array([3.50, ACID_SIG[0], ACID_SIG[1], ACID_SIG[2], 1.0,
                    SIG_O, 1.0])

    # ---- bonded tables ----
    b_idx = np.array([[b[0], b[1]] for b in bonds], dtype=np.int32)
    b_k = np.array([b[2] for b in bonds])
    b_r0 = np.array([b[3] for b in bonds])
    a_idx = np.array([[a[0], a[1], a[2]] for a in angles], dtype=np.int32)
    a_k = np.array([a[3] for a in angles])
    a_t0 = np.array([a[4] for a in angles])
    d_idx = np.array([[d[0], d[1], d[2], d[3]] for d in dihedrals],
                     dtype=np.int32).reshape(-1, 4)
    d_k = np.array([d[4] for d in dihedrals])
    d_n = np.array([d[5] for d in dihedrals])
    d_d = np.array([d[6] for d in dihedrals])

    wat_bonds = np.concatenate([
        np.stack([wat_o, wat_o + 1], -1),
        np.stack([wat_o, wat_o + 2], -1),
        np.stack([wat_o + 1, wat_o + 2], -1),
    ])
    excl_idx, excl_code = build_exclusions(
        n, np.concatenate([b_idx, wat_bonds]), max_excl=24)

    bonded = BondedParams(
        bond_idx=jnp.asarray(b_idx),
        bond_k=jnp.asarray(b_k, dtype=dtype),
        bond_r0=jnp.asarray(b_r0, dtype=dtype),
        bond_mask=jnp.ones((len(b_idx),), dtype=dtype),
        angle_idx=jnp.asarray(a_idx),
        angle_k=jnp.asarray(a_k, dtype=dtype),
        angle_t0=jnp.asarray(a_t0, dtype=dtype),
        angle_mask=jnp.ones((len(a_idx),), dtype=dtype),
        dihedral_idx=jnp.asarray(d_idx),
        dihedral_k=jnp.asarray(d_k, dtype=dtype),
        dihedral_n=jnp.asarray(d_n, dtype=dtype),
        dihedral_d=jnp.asarray(d_d, dtype=dtype),
        dihedral_mask=jnp.ones((len(d_idx),), dtype=dtype),
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

    # ---- multi-site λ table: n_buffer_waters buffer waters per site ----
    # The compensating +1e is spread over n_buffer_waters scattered waters
    # (+1/(3·n_buf) per atom). Solvent reorganization scales as Σ_i dq_i²
    # (Marcus), so a single buffer water carrying the full +1e adds a
    # ~15-25 kcal/mol mid-λ barrier that makes full-Δq titration
    # metastable (measured round 3: 16 kcal of WT-metadynamics fill at
    # λ≈0.42 without a single crossing); spreading over N waters cuts the
    # buffer-side term by 1/N — the standard collective-buffer scheme of
    # production constant-pH codes. Buffers are drawn from a seeded
    # permutation so each site's set is scattered through the box, and
    # sites' sets are disjoint.
    n_sites_tot = len(site_atoms)
    if n_sites_tot * n_buffer_waters > n_wat:
        raise ValueError(
            f"need {n_sites_tot * n_buffer_waters} buffer waters, "
            f"only {n_wat} available")
    perm = np.random.default_rng(seed + 1).permutation(n_wat)
    specs = []
    for s, ids in enumerate(site_atoms):
        # dq_scale < 1 reduces the site's Δq (the solvent-reorganization
        # barrier scales as Δq² — same knob as solvated_acid's
        # lambda_coupled; 1.0 = the full protonation charge change)
        bufs = wat_o[perm[s::n_sites_tot][:n_buffer_waters]]
        specs.append(make_single_site(
            atom_idx=ids,
            q_prot=ACID_Q_PROT,
            q_deprot=ACID_Q_PROT + (ACID_Q_DEPROT - ACID_Q_PROT) * dq_scale,
            pK=pKs[s % len(pKs)],
            buffer_idx=np.stack([bufs, bufs + 1, bufs + 2], -1).reshape(-1),
            dtype=dtype,
        ))
    spec = stack_sites(specs)

    trip = np.stack([wat_o, wat_o + 1, wat_o + 2], axis=-1)
    constraints = RigidTriatomic(trip, mass, R_OH, R_HH)

    box = np.array([box_len] * 3)
    nbr_params = make_neighbor_params(box, cutoff, n_atoms=n, skin=skin)
    state = make_state(
        x, box=box, lam=np.full(len(site_atoms), 0.2), pH=pH,
        seed=seed, dtype=dtype,
    )
    key = jax.random.PRNGKey(seed + 1)
    state = state.replace(v=maxwell_boltzmann(key, ff.mass, T, dtype=dtype))

    groupH_mask = np.zeros((n,), dtype=bool)
    for ids in site_atoms:
        groupH_mask[ids[3]] = True
    return System(
        ff=ff, state=state, nbr_params=nbr_params, bonded=bonded,
        constraints=constraints, spec=spec,
        groupH_mask=jnp.asarray(groupH_mask),
    )
