"""Ewald k-space: Madelung constant, α-invariance, grad/φ identities
(SURVEY.md §4 tier 3 "Ewald vs direct-sum parity on a toy charge lattice")."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu import neighbors, units
from constant_ph_tpu.forcefield import make_pair_params
from constant_ph_tpu.ops import ewald, pair

MADELUNG_NACL = 1.747564594633


def _nacl(n_cells=2, r0=2.82):
    """Rock-salt lattice: alternating ±1 charges on a simple cubic grid."""
    a = 2 * r0
    pts, qs = [], []
    for i in range(2 * n_cells):
        for j in range(2 * n_cells):
            for k in range(2 * n_cells):
                pts.append([i * r0, j * r0, k * r0])
                qs.append(1.0 if (i + j + k) % 2 == 0 else -1.0)
    x = jnp.asarray(np.array(pts), dtype=jnp.float32)
    q = jnp.asarray(np.array(qs), dtype=jnp.float32)
    box = jnp.asarray(np.array([n_cells * a] * 3), dtype=jnp.float32)
    return x, q, box, r0


def _total_coulomb(x, q, box, alpha, rc, kmax=None, accuracy=1e-6):
    """Real-space (erfc) + reciprocal + self + background Coulomb energy."""
    n = x.shape[0]
    types = jnp.zeros((n,), dtype=jnp.int32)
    pp = make_pair_params([0.0], [1.0], rc, alpha=alpha, shift=False)
    nbp = neighbors.make_neighbor_params(box, rc, n_atoms=n, skin=0.5,
                                         use_cells=False, capacity=n)
    excl = jnp.full((n, 1), -1, dtype=jnp.int32)
    code = jnp.zeros((n, 1), dtype=jnp.int32)
    nbr = neighbors.build_neighbor_list(x, box, nbp, excl, code)
    pr = pair.pair_forces(x, q, types, box, nbr, pp)
    ep = ewald.make_ewald_params(box, alpha, accuracy=accuracy, kmax=kmax)
    e_rec, f_rec, phi_rec, eatom_rec = ewald.ewald_recip(x, q, ep)
    return pr, (e_rec, f_rec, phi_rec, eatom_rec), float(pr.e_coul + e_rec)


def test_madelung_constant():
    x, q, box, r0 = _nacl()
    n = x.shape[0]
    alpha = 3.0 / 5.5
    _, _, e_total = _total_coulomb(x, q, box, alpha, rc=5.5)
    # E_per_ion = −M·C/ (2·r0) · q²·2 … total = −N·M·C·q²/(2·r0)·…
    # Standard: E_total = −(N/2)·M·C·q²/r0 per formula with per-ion-pair M
    want = -0.5 * n * MADELUNG_NACL * units.QQR2E / r0
    np.testing.assert_allclose(e_total, want, rtol=2e-4)


def test_alpha_invariance():
    # the α-split is internal bookkeeping: total must not depend on it
    x, q, box, r0 = _nacl()
    key = jax.random.PRNGKey(0)
    x = x + 0.15 * jax.random.normal(key, x.shape)  # break symmetry
    _, _, e1 = _total_coulomb(x, q, box, alpha=0.45, rc=5.5)
    _, _, e2 = _total_coulomb(x, q, box, alpha=0.62, rc=5.5)
    np.testing.assert_allclose(e1, e2, rtol=5e-4)


def test_recip_force_is_minus_grad():
    x, q, box, _ = _nacl()
    key = jax.random.PRNGKey(1)
    x = x + 0.2 * jax.random.normal(key, x.shape)
    ep = ewald.make_ewald_params(box, 0.5, accuracy=1e-5)
    e, f, phi, eatom = ewald.ewald_recip(x, q, ep)
    g = jax.grad(lambda xx: ewald.ewald_recip(xx, q, ep)[0])(x)
    scale = float(jnp.max(jnp.abs(f)))
    np.testing.assert_allclose(
        np.asarray(f) / scale, np.asarray(-g) / scale, atol=5e-5)


def test_recip_phi_is_dUdq():
    x, q, box, _ = _nacl()
    key = jax.random.PRNGKey(2)
    x = x + 0.2 * jax.random.normal(key, x.shape)
    q = q + 0.1 * jax.random.normal(jax.random.PRNGKey(3), q.shape)
    ep = ewald.make_ewald_params(box, 0.5, accuracy=1e-5)
    e, f, phi, eatom = ewald.ewald_recip(x, q, ep)
    g = jax.grad(lambda qq: ewald.ewald_recip(x, qq, ep)[0])(q)
    np.testing.assert_allclose(np.asarray(phi), np.asarray(g),
                               rtol=1e-3, atol=1e-3)
    # per-atom tally sums to the total (the kspace eatom contract)
    np.testing.assert_allclose(float(jnp.sum(eatom)), float(e), rtol=1e-5)


def test_combined_force_consistency():
    # real+recip total force via autodiff of the combined energy
    x, q, box, _ = _nacl()
    key = jax.random.PRNGKey(4)
    x = x + 0.15 * jax.random.normal(key, x.shape)
    alpha, rc = 0.55, 5.5
    pr, (e_rec, f_rec, phi_rec, _), e_tot = _total_coulomb(x, q, box, alpha, rc)
    f_total = np.asarray(pr.force + f_rec)

    # autodiff of the combined energy (f32 finite differences would drown
    # in the −9000 kcal/mol total's roundoff); neighbor list held fixed
    n = x.shape[0]
    types = jnp.zeros((n,), dtype=jnp.int32)
    pp = make_pair_params([0.0], [1.0], rc, alpha=alpha, shift=False)
    nbp = neighbors.make_neighbor_params(box, rc, n_atoms=n, skin=0.5,
                                         use_cells=False, capacity=n)
    excl = jnp.full((n, 1), -1, dtype=jnp.int32)
    code = jnp.zeros((n, 1), dtype=jnp.int32)
    nbr = neighbors.build_neighbor_list(x, box, nbp, excl, code)
    ep = ewald.make_ewald_params(box, alpha, accuracy=1e-6)

    def combined_energy(xx):
        pr2 = pair.pair_forces(xx, q, types, box, nbr, pp)
        return pr2.e_coul + ewald.ewald_recip(xx, q, ep)[0]

    g = np.asarray(jax.grad(combined_energy)(x))
    scale = np.abs(f_total).max()
    np.testing.assert_allclose(f_total / scale, -g / scale, atol=5e-5)
