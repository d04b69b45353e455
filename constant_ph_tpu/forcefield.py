"""Force-field parameter pytrees.

The analog of LAMMPS's Force/Pair/Bond/... parameter plumbing that the
reference consumes through per-atom energy tallies (fix_constant_pH.cpp:
216-244). Parameters are device arrays; per-type LJ coefficients are
precomputed into mixed (ntypes × ntypes) tables so the pair kernel does two
small-table gathers instead of mixing rules in the hot loop.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class PairParams:
    """LJ + Coulomb real-space parameters.

    ``alpha`` is the Ewald splitting parameter: 0.0 ⇒ plain cut Coulomb
    (erfc(0·r) = 1 recovers 1/r exactly), >0 ⇒ the real-space part of
    Ewald with the reciprocal part supplied by ops.ewald.
    """

    c12: jax.Array        # (T, T) 4εσ¹² mixed table, kcal/mol·Å¹²
    c6: jax.Array         # (T, T) 4εσ⁶ mixed table, kcal/mol·Å⁶
    e_shift: jax.Array    # (T, T) LJ energy shift at the cutoff (0 if unshifted)
    cutoff: float = struct.field(pytree_node=False, default=10.0)
    coul_cutoff: float = struct.field(pytree_node=False, default=10.0)
    alpha: float = struct.field(pytree_node=False, default=0.0)
    # 'cut': plain truncation (α=0) or Ewald real-space (α>0, reciprocal
    #        part supplied by ops.ewald);
    # 'dsf': damped-shifted-force Coulomb (Fennell–Gezelter) — energy AND
    #        force continuous at the cutoff; the conserving standalone
    #        electrostatics (LAMMPS coul/dsf analog).
    coul_style: str = struct.field(pytree_node=False, default="cut")
    # special-bonds scale factors indexed by neighbor code 0..3
    # (0 = normal, 1 = 1-2, 2 = 1-3, 3 = 1-4); LAMMPS-style semantics.
    special_lj: jax.Array = struct.field(
        default_factory=lambda: jnp.array([1.0, 0.0, 0.0, 0.0])
    )
    special_coul: jax.Array = struct.field(
        default_factory=lambda: jnp.array([1.0, 0.0, 0.0, 0.0])
    )


def make_pair_params(
    epsilon,
    sigma,
    cutoff: float,
    *,
    coul_cutoff: float | None = None,
    alpha: float = 0.0,
    coul_style: str = "cut",
    shift: bool = True,
    special_lj=(1.0, 0.0, 0.0, 0.0),
    special_coul=(1.0, 0.0, 0.0, 0.0),
    dtype=jnp.float32,
) -> PairParams:
    """Build mixed LJ tables from per-type ε, σ (Lorentz–Berthelot)."""
    eps = np.asarray(epsilon, dtype=np.float64)
    sig = np.asarray(sigma, dtype=np.float64)
    eps_ij = np.sqrt(eps[:, None] * eps[None, :])
    sig_ij = 0.5 * (sig[:, None] + sig[None, :])
    c12 = 4.0 * eps_ij * sig_ij**12
    c6 = 4.0 * eps_ij * sig_ij**6
    if shift:
        rc = cutoff
        e_shift = c12 / rc**12 - c6 / rc**6
    else:
        e_shift = np.zeros_like(c12)
    return PairParams(
        c12=jnp.asarray(c12, dtype=dtype),
        c6=jnp.asarray(c6, dtype=dtype),
        e_shift=jnp.asarray(e_shift, dtype=dtype),
        cutoff=float(cutoff),
        coul_cutoff=float(coul_cutoff if coul_cutoff is not None else cutoff),
        alpha=float(alpha),
        coul_style=coul_style,
        special_lj=jnp.asarray(special_lj, dtype=dtype),
        special_coul=jnp.asarray(special_coul, dtype=dtype),
    )


@struct.dataclass
class BondedParams:
    """Harmonic bonds/angles + CHARMM-style dihedrals/impropers.

    Index arrays are fixed-shape (padded with count masks); the per-atom
    energy contributions mirror the reference's bond/angle/dihedral/improper
    eatom sweeps (fix_constant_pH.cpp:221-239).
    """

    bond_idx: jax.Array      # (NB, 2) int32
    bond_k: jax.Array        # (NB,) kcal/mol/Å²  (E = k (r−r0)²; LAMMPS convention)
    bond_r0: jax.Array       # (NB,) Å
    bond_mask: jax.Array     # (NB,)
    angle_idx: jax.Array     # (NA, 3) int32 (i-j-k, j = vertex)
    angle_k: jax.Array       # (NA,) kcal/mol/rad²
    angle_t0: jax.Array      # (NA,) radians
    angle_mask: jax.Array    # (NA,)
    dihedral_idx: jax.Array  # (ND, 4) int32
    dihedral_k: jax.Array    # (ND,)
    dihedral_n: jax.Array    # (ND,) multiplicity
    dihedral_d: jax.Array    # (ND,) phase (radians)
    dihedral_mask: jax.Array # (ND,)
    improper_idx: jax.Array  # (NI, 4) int32
    improper_k: jax.Array    # (NI,)
    improper_x0: jax.Array   # (NI,) equilibrium chi (radians)
    improper_mask: jax.Array # (NI,)


def empty_bonded(dtype=jnp.float32) -> BondedParams:
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    zi = lambda *s: jnp.zeros(s, dtype=jnp.int32)
    return BondedParams(
        bond_idx=zi(0, 2), bond_k=z(0), bond_r0=z(0), bond_mask=z(0),
        angle_idx=zi(0, 3), angle_k=z(0), angle_t0=z(0), angle_mask=z(0),
        dihedral_idx=zi(0, 4), dihedral_k=z(0), dihedral_n=z(0),
        dihedral_d=z(0), dihedral_mask=z(0),
        improper_idx=zi(0, 4), improper_k=z(0), improper_x0=z(0),
        improper_mask=z(0),
    )


@struct.dataclass
class ForceField:
    """Everything static about the interactions of one system."""

    mass: jax.Array       # (N,) g/mol
    q0: jax.Array         # (N,) base (all-protonated, λ=0) charges, e
    type: jax.Array       # (N,) int32 atom type
    pair: PairParams
    bonded: BondedParams
    # exclusion lists: for each atom, up to KE excluded/special partners
    excl_idx: jax.Array   # (N, KE) int32, padded with -1
    excl_code: jax.Array  # (N, KE) int32: 1 = 1-2, 2 = 1-3, 3 = 1-4

    @property
    def n_atoms(self) -> int:
        return self.mass.shape[0]


def build_exclusions(
    n_atoms: int,
    bonds: np.ndarray,
    *,
    max_excl: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Derive 1-2/1-3/1-4 special-pair tables from the bond graph.

    Host-side topology work — the analog of LAMMPS's special-bonds
    machinery. Uses the native C++ builder (constant_ph_tpu/native)
    when the toolchain is available; pure-Python fallback otherwise.
    """
    native = _build_exclusions_native(n_atoms, bonds, max_excl)
    if native is not None:
        return native
    adj: list[set[int]] = [set() for _ in range(n_atoms)]
    for i, j in np.asarray(bonds, dtype=np.int64).reshape(-1, 2):
        adj[i].add(int(j))
        adj[j].add(int(i))
    excl_idx = np.full((n_atoms, max_excl), -1, dtype=np.int32)
    excl_code = np.zeros((n_atoms, max_excl), dtype=np.int32)
    overflow = 0
    for i in range(n_atoms):
        one2 = adj[i]
        one3 = set()
        for j in one2:
            one3 |= adj[j]
        one3 -= one2 | {i}
        one4 = set()
        for k in one3:
            one4 |= adj[k]
        one4 -= one2 | one3 | {i}
        entries = [(j, 1) for j in sorted(one2)]
        entries += [(j, 2) for j in sorted(one3)]
        entries += [(j, 3) for j in sorted(one4)]
        if len(entries) > max_excl:
            overflow = max(overflow, len(entries))
            entries = entries[:max_excl]
        for s, (j, code) in enumerate(entries):
            excl_idx[i, s] = j
            excl_code[i, s] = code
    if overflow:
        raise ValueError(
            f"exclusion capacity {max_excl} exceeded (need {overflow}); "
            "raise max_excl"
        )
    return excl_idx, excl_code


def _build_exclusions_native(n_atoms, bonds, max_excl):
    """C++ fast path for build_exclusions (None if unavailable)."""
    import ctypes

    try:
        from constant_ph_tpu.native.build import load_library
    except ImportError:
        return None
    lib = load_library("topology")
    if lib is None:
        return None
    bonds = np.ascontiguousarray(np.asarray(bonds, dtype=np.int64)
                                 .reshape(-1, 2))
    excl_idx = np.full((n_atoms, max_excl), -1, dtype=np.int64)
    excl_code = np.zeros((n_atoms, max_excl), dtype=np.int64)
    lib.build_exclusions.restype = ctypes.c_int64
    ret = lib.build_exclusions(
        ctypes.c_int64(n_atoms), ctypes.c_int64(bonds.shape[0]),
        bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(max_excl),
        excl_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        excl_code.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    if ret != 0:
        raise ValueError(
            f"exclusion capacity {max_excl} exceeded (need {ret}); "
            "raise max_excl")
    return excl_idx.astype(np.int32), excl_code.astype(np.int32)
