"""Pair kernel: F = −∇U via jax.grad; eatom sums to totals; φ identity.

The invariants behind the reference's eatom contract (SURVEY.md §4 tier 2):
per-atom energy tallies must sum to the total, and the electrostatic
potential φ must satisfy Σ qφ = 2·E_coul.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu import neighbors
from constant_ph_tpu.forcefield import (
    ForceField, empty_bonded, make_pair_params, build_exclusions,
)
from constant_ph_tpu.ops import pair
from constant_ph_tpu.systems import lj_fluid


def _charged_system(seed=0, n_cells=3, alpha=0.0):
    ff, state, nbp = lj_fluid(n_cells=n_cells, seed=seed)
    n = state.x.shape[0]
    rng = np.random.default_rng(seed)
    q = rng.normal(size=n) * 0.2
    q -= q.mean()  # neutral cell
    pp = dataclasses.replace(ff.pair, alpha=alpha)
    ff = ff.replace(q0=jnp.asarray(q, dtype=jnp.float32), pair=pp)
    key = jax.random.PRNGKey(seed + 10)
    x = state.x + 0.25 * jax.random.normal(key, state.x.shape)
    return ff, x, state.box, nbp


def test_force_is_minus_grad():
    for alpha in (0.0, 0.3):
        ff, x, box, nbp = _charged_system(alpha=alpha)
        nbr = neighbors.build_neighbor_list(x, box, nbp, ff.excl_idx, ff.excl_code)
        res = pair.pair_forces(x, ff.q0, ff.type, box, nbr, ff.pair)
        g = jax.grad(
            lambda xx: pair.pair_energy(xx, ff.q0, ff.type, box, nbr, ff.pair)
        )(x)
        f = np.asarray(res.force)
        gm = np.asarray(-g)
        scale = max(1.0, np.abs(f).max())
        np.testing.assert_allclose(f / scale, gm / scale, atol=2e-4)


def test_eatom_sums_to_total_energy():
    ff, x, box, nbp = _charged_system()
    nbr = neighbors.build_neighbor_list(x, box, nbp, ff.excl_idx, ff.excl_code)
    res = pair.pair_forces(x, ff.q0, ff.type, box, nbr, ff.pair)
    total = float(res.e_lj + res.e_coul)
    np.testing.assert_allclose(float(jnp.sum(res.eatom)), total, rtol=1e-5)


def test_phi_identity():
    # Σ q_i φ_i = 2 E_coul for pairwise Coulomb
    ff, x, box, nbp = _charged_system(alpha=0.3)
    nbr = neighbors.build_neighbor_list(x, box, nbp, ff.excl_idx, ff.excl_code)
    res = pair.pair_forces(x, ff.q0, ff.type, box, nbr, ff.pair)
    lhs = float(jnp.sum(ff.q0 * res.phi))
    rhs = 2.0 * float(res.e_coul)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_phi_is_dUdq():
    # φ must equal ∂E_coul/∂q exactly (the dU/dλ backbone, SURVEY.md §3.5)
    ff, x, box, nbp = _charged_system(alpha=0.3)
    nbr = neighbors.build_neighbor_list(x, box, nbp, ff.excl_idx, ff.excl_code)

    def e_coul(q):
        return pair.pair_forces(x, q, ff.type, box, nbr, ff.pair).e_coul

    g = jax.grad(e_coul)(ff.q0)
    res = pair.pair_forces(x, ff.q0, ff.type, box, nbr, ff.pair)
    np.testing.assert_allclose(
        np.asarray(res.phi), np.asarray(g), rtol=2e-3, atol=2e-3
    )


def test_special_bond_scaling():
    # two bonded atoms: code-1 neighbors must be scaled by special[1]
    n = 2
    x = jnp.array([[0.0, 0.0, 0.0], [1.5, 0.0, 0.0]])
    box = jnp.array([20.0, 20.0, 20.0])
    excl_idx, excl_code = build_exclusions(n, np.array([[0, 1]]), max_excl=4)
    for s12, expect_zero in [((1.0, 0.0, 0.0, 0.0), True),
                             ((1.0, 0.5, 0.0, 0.0), False)]:
        pp = make_pair_params([0.2], [1.0], 5.0, special_lj=s12,
                              special_coul=s12, shift=False)
        ff_q = jnp.array([0.5, -0.5])
        types = jnp.zeros(n, dtype=jnp.int32)
        nbp = neighbors.make_neighbor_params(box, 5.0, n_atoms=n, use_cells=False)
        nbr = neighbors.build_neighbor_list(
            x, box, nbp, jnp.asarray(excl_idx), jnp.asarray(excl_code))
        res = pair.pair_forces(x, ff_q, types, box, nbr, pp)
        if expect_zero:
            assert abs(float(res.e_lj)) < 1e-10
            assert abs(float(res.e_coul)) < 1e-10
        else:
            # half of the full interaction
            pp_full = make_pair_params([0.2], [1.0], 5.0,
                                       special_lj=(1.0, 1.0, 0.0, 0.0),
                                       special_coul=(1.0, 1.0, 0.0, 0.0),
                                       shift=False)
            res_full = pair.pair_forces(x, ff_q, types, box, nbr, pp_full)
            np.testing.assert_allclose(
                float(res.e_lj), 0.5 * float(res_full.e_lj), rtol=1e-5)
            np.testing.assert_allclose(
                float(res.e_coul), 0.5 * float(res_full.e_coul), rtol=1e-5)
