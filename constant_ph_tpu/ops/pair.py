"""Real-space pair interactions: LJ + Coulomb over padded neighbor lists.

This is the engine's hot loop — the analog of the LAMMPS pair compute whose
per-atom energies the reference harvests (force->pair->eatom,
fix_constant_pH.cpp:216-219). Design (SURVEY.md §2.3.3):

- full (double-counted) neighbor lists: every atom reduces over its own
  (K,) row, so force accumulation is a row-sum with NO scatter — the shape
  TPUs like. Pair energies are halved per atom, reproducing exactly the
  eatom half-share convention of the reference (fix_constant_pH.cpp:218).
- per-atom electrostatic potential φ_i = ∂U_elec/∂q_i emitted in the same
  pass, giving the exact dU/dλ = Σ φ·dq/dλ that replaces the reference's
  HB−HA differencing (SURVEY.md §3.5).
- one Coulomb formula covers cut and Ewald-real-space: with splitting
  parameter α, e = C·qq·(erfc(αr) − (1 − s))/r where s is the special-bond
  scale; α = 0 recovers s·C·qq/r (plain cut), α > 0 gives the Ewald real
  part with excluded-pair reciprocal-space compensation built in (the
  standard pair_lj_cut_coul_long treatment).

The jnp implementation here is the semantic reference for the canonical
(N, K)-neighbor-list engine; the production hot path is the gather-free
cell-tile stencil in tiled/forces.py, with a Pallas water-water kernel
(tiled/pallas_ww.py) validated against it in interpret mode (SURVEY.md
§5.2's "sanitizer" policy).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import units
from constant_ph_tpu.forcefield import PairParams
from constant_ph_tpu.neighbors import NeighborList
from constant_ph_tpu.ops.kernels import R2_MIN as _R2_MIN
from constant_ph_tpu.ops.kernels import coul_kernel
from constant_ph_tpu.state import min_image


@struct.dataclass
class PairResult:
    force: jax.Array    # (N, 3) kcal/mol/Å
    eatom: jax.Array    # (N,) per-atom energy half-shares (the eatom contract)
    phi: jax.Array      # (N,) ∂U_elec/∂q_i, kcal/mol/e
    e_lj: jax.Array     # () total LJ energy
    e_coul: jax.Array   # () total real-space Coulomb energy
    virial: jax.Array   # () scalar virial Σ r·f (for pressure)


def pair_forces(
    x: jax.Array,
    q: jax.Array,
    types: jax.Array,
    box: jax.Array,
    nbr: NeighborList,
    pp: PairParams,
) -> PairResult:
    n = x.shape[0]
    dtype = x.dtype

    j = nbr.idx                                   # (N, K)
    jc = jnp.clip(j, 0, n - 1)
    valid = j < n                                 # (N, K) bool

    # TPU layout: three independent per-coordinate (N,) → (N, K) gathers.
    # A fused (N, K, 3) gather would be lane-padded 3→128 on TPU (42×
    # memory); keeping each component as its own (N, K) array tiles cleanly.
    dx = []
    r2 = jnp.zeros(jc.shape, dtype=dtype)
    for d in range(3):
        xd = jax.lax.index_in_dim(x, d, axis=1, keepdims=False)
        dxd = min_image(xd[:, None] - xd[jc], box[d])          # j → i
        dx.append(dxd)
        r2 = r2 + dxd * dxd                                    # (N, K)
    # NaN-safe padding: push sentinel pairs outside every cutoff so they
    # never divide by ~0 (keeps grads finite — the "double-where" rule).
    far = max(pp.cutoff, pp.coul_cutoff) ** 2 + 1.0
    r2 = jnp.where(valid, jnp.maximum(r2, _R2_MIN), far)
    r = jnp.sqrt(r2)
    inv_r2 = 1.0 / r2

    # LJ with mixed tables and special scaling
    ti = types[:, None]
    tj = types[jc]
    c12 = pp.c12[ti, tj]
    c6 = pp.c6[ti, tj]
    eshift = pp.e_shift[ti, tj]
    slj = pp.special_lj[nbr.code].astype(dtype)
    scoul = pp.special_coul[nbr.code].astype(dtype)

    in_lj = (r2 < pp.cutoff * pp.cutoff).astype(dtype)
    inv_r6 = inv_r2 * inv_r2 * inv_r2
    e_lj_pair = (c12 * inv_r6 - c6) * inv_r6 - eshift
    f_lj = (12.0 * c12 * inv_r6 - 6.0 * c6) * inv_r6 * inv_r2
    wlj = in_lj * slj
    e_lj_pair = e_lj_pair * wlj
    f_lj = f_lj * wlj

    # Coulomb via the shared kernel (ops/kernels.py): cut / Ewald-real /
    # DSF semantics incl. special-pair handling
    qi = q[:, None]
    qj = q[jc]
    in_c = (r2 < pp.coul_cutoff * pp.coul_cutoff).astype(dtype)
    u_r, w_r = coul_kernel(
        r2, r, inv_r2, scoul,
        alpha=pp.alpha, style=pp.coul_style, rc=pp.coul_cutoff,
    )
    kqq = units.QQR2E * qi * qj
    e_c_pair = kqq * u_r * in_c
    f_c = kqq * w_r * in_c
    # φ uses the same kernel so that Σᵢ qᵢφᵢ = 2·E_coul exactly
    phi_pair = units.QQR2E * qj * u_r * in_c

    fpair = f_lj + f_c                            # (N, K), force/r along dx
    force = jnp.stack(
        [jnp.sum(fpair * dx[d], axis=1) for d in range(3)], axis=-1
    )                                             # (N, 3)
    eatom = 0.5 * jnp.sum(e_lj_pair + e_c_pair, axis=1)
    phi = jnp.sum(phi_pair, axis=1)
    virial = 0.5 * jnp.sum(fpair * r2)

    return PairResult(
        force=force,
        eatom=eatom,
        phi=phi,
        e_lj=0.5 * jnp.sum(e_lj_pair),
        e_coul=0.5 * jnp.sum(e_c_pair),
        virial=virial,
    )


def pair_energy(x, q, types, box, nbr, pp: PairParams):
    """Total pair energy only (for grad-based force verification in tests)."""
    res = pair_forces(x, q, types, box, nbr, pp)
    return res.e_lj + res.e_coul
