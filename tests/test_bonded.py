"""Bonded terms: closed-form values, eatom tally consistency (SURVEY §4.2)."""
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu.forcefield import BondedParams
from constant_ph_tpu.ops import bonded


def _bp(**kw):
    dtype = jnp.float32
    z = lambda *s: jnp.zeros(s, dtype=dtype)
    zi = lambda *s: jnp.zeros(s, dtype=jnp.int32)
    d = dict(
        bond_idx=zi(0, 2), bond_k=z(0), bond_r0=z(0), bond_mask=z(0),
        angle_idx=zi(0, 3), angle_k=z(0), angle_t0=z(0), angle_mask=z(0),
        dihedral_idx=zi(0, 4), dihedral_k=z(0), dihedral_n=z(0),
        dihedral_d=z(0), dihedral_mask=z(0),
        improper_idx=zi(0, 4), improper_k=z(0), improper_x0=z(0),
        improper_mask=z(0),
    )
    d.update(kw)
    return BondedParams(**d)


BOX = jnp.array([50.0, 50.0, 50.0])


def test_bond_energy_and_force():
    x = jnp.array([[0.0, 0, 0], [1.5, 0, 0], [10, 10, 10]])
    bp = _bp(bond_idx=jnp.array([[0, 1]], dtype=jnp.int32),
             bond_k=jnp.array([100.0]), bond_r0=jnp.array([1.0]),
             bond_mask=jnp.array([1.0]))
    e, f, eatom = bonded.bonded_forces(x, BOX, bp)
    assert np.isclose(float(e), 100.0 * 0.25, rtol=1e-5)
    # force on atom 0 pulls toward atom 1 with |F| = 2k(r-r0)
    np.testing.assert_allclose(np.asarray(f[0]), [100.0, 0, 0], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(f[2]), 0.0, atol=1e-7)
    assert np.isclose(float(jnp.sum(eatom)), float(e), rtol=1e-5)


def test_bond_across_pbc():
    x = jnp.array([[0.5, 0, 0], [49.0, 0, 0]])  # min image distance 1.5
    bp = _bp(bond_idx=jnp.array([[0, 1]], dtype=jnp.int32),
             bond_k=jnp.array([100.0]), bond_r0=jnp.array([1.0]),
             bond_mask=jnp.array([1.0]))
    e, _, _ = bonded.bonded_forces(x, BOX, bp)
    assert np.isclose(float(e), 25.0, rtol=1e-5)


def test_angle_energy():
    x = jnp.array([[1.0, 0, 0], [0.0, 0, 0], [0, 1.0, 0]])  # 90 degrees
    bp = _bp(angle_idx=jnp.array([[0, 1, 2]], dtype=jnp.int32),
             angle_k=jnp.array([50.0]),
             angle_t0=jnp.array([np.pi / 3]),
             angle_mask=jnp.array([1.0]))
    e, f, eatom = bonded.bonded_forces(x, BOX, bp)
    want = 50.0 * (np.pi / 2 - np.pi / 3) ** 2
    assert np.isclose(float(e), want, rtol=1e-5)
    assert np.isclose(float(jnp.sum(eatom)), float(e), rtol=1e-5)


def test_dihedral_energy():
    # trans (φ=π) butane-like geometry
    x = jnp.array([[0.0, 1, 0], [0, 0, 0], [1.0, 0, 0], [1.0, -1, 0]])
    bp = _bp(dihedral_idx=jnp.array([[0, 1, 2, 3]], dtype=jnp.int32),
             dihedral_k=jnp.array([2.0]), dihedral_n=jnp.array([1.0]),
             dihedral_d=jnp.array([0.0]), dihedral_mask=jnp.array([1.0]))
    e, f, eatom = bonded.bonded_forces(x, BOX, bp)
    # E = k (1 + cos φ) = 2(1 + cos π) = 0 at trans
    assert np.isclose(float(e), 0.0, atol=1e-5)
    # cis: φ=0 → E = 2k
    x_cis = jnp.array([[0.0, 1, 0], [0, 0, 0], [1.0, 0, 0], [1.0, 1, 0]])
    e2, _, _ = bonded.bonded_forces(x_cis, BOX, bp)
    assert np.isclose(float(e2), 4.0, rtol=1e-5)


def test_improper_energy():
    x = jnp.array([[0.0, 1, 0], [0, 0, 0], [1.0, 0, 0], [1.0, 1, 0.3]])
    bp = _bp(improper_idx=jnp.array([[0, 1, 2, 3]], dtype=jnp.int32),
             improper_k=jnp.array([10.0]), improper_x0=jnp.array([0.0]),
             improper_mask=jnp.array([1.0]))
    e, f, eatom = bonded.bonded_forces(x, BOX, bp)
    assert float(e) > 0
    assert np.isclose(float(jnp.sum(eatom)), float(e), rtol=1e-5)
    # flat geometry → zero improper energy
    x_flat = x.at[3, 2].set(0.0)
    e0, _, _ = bonded.bonded_forces(x_flat, BOX, bp)
    assert np.isclose(float(e0), 0.0, atol=1e-6)
