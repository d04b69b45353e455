"""Unit tests for the pure λ-dynamics math (SURVEY.md §4 tier 1).

Checks the closed forms of U1..U5 / dU1..dU5 (with the §8 derivative
corrections) against jax.grad, the switching sigmoid, q(λ) interpolation and
its charge-neutrality invariant, and the exact dU/dλ contraction.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_ph_tpu import lambda_dyn, units


P = lambda_dyn.BiasParams()
LAMS = jnp.linspace(-0.2, 1.2, 29)


def test_switching_values_and_grad():
    f, df = lambda_dyn.switching(LAMS, P)
    # midpoint and asymptotes
    fm, _ = lambda_dyn.switching(jnp.array(0.5), P)
    assert np.isclose(float(fm), 0.5, atol=1e-6)
    f0, _ = lambda_dyn.switching(jnp.array(0.0), P)
    f1, _ = lambda_dyn.switching(jnp.array(1.0), P)
    assert float(f0) < 1e-8 and float(f1) > 1 - 1e-8
    # analytic derivative vs autodiff
    g = jax.vmap(jax.grad(lambda l: lambda_dyn.switching(l, P)[0]))(LAMS)
    np.testing.assert_allclose(np.asarray(df), np.asarray(g), rtol=1e-4, atol=1e-6)


def test_bias_closed_form_at_midpoint():
    # At λ=0.5 the wells/walls are negligible and U ≈ d (barrier peak).
    U, dU = lambda_dyn.bias(jnp.array(0.5), P)
    assert np.isclose(float(U), P.d, atol=1e-3)
    assert abs(float(dU)) < 1e-2  # symmetric point


def test_bias_walls_confine():
    # Outside [−m, 1+m] the erf walls rise to ~w.
    U_lo, dU_lo = lambda_dyn.bias(jnp.array(-0.35), P)
    U_hi, dU_hi = lambda_dyn.bias(jnp.array(1.35), P)
    assert float(U_lo) > 0.8 * P.w and float(U_hi) > 0.8 * P.w
    # wall gradient pushes λ back into [0,1]
    U, dU = lambda_dyn.bias(jnp.array(-0.2), P)
    assert float(dU) < 0  # force −dU > 0 pushes λ up
    U, dU = lambda_dyn.bias(jnp.array(1.2), P)
    assert float(dU) > 0


def test_bias_grad_matches_autodiff():
    _, dU = lambda_dyn.bias(LAMS, P)
    g = jax.vmap(jax.grad(lambda l: lambda_dyn.bias(l, P)[0]))(LAMS)
    np.testing.assert_allclose(np.asarray(dU), np.asarray(g), rtol=1e-4, atol=1e-5)


def _toy_spec(buffer=True):
    q_prot = np.array([0.4, 0.1], dtype=np.float32)
    q_deprot = np.array([-0.5, 0.0], dtype=np.float32)
    return lambda_dyn.make_single_site(
        atom_idx=[2, 3],
        q_prot=q_prot,
        q_deprot=q_deprot,
        pK=4.25,
        buffer_idx=[5, 6, 7] if buffer else None,
    )


def test_charge_interpolation_endpoints_and_neutrality():
    spec = _toy_spec()
    q0 = jnp.array([0.0, 0.0, 0.4, 0.1, 0.0, -0.8, 0.4, 0.4], dtype=jnp.float32)
    total0 = float(jnp.sum(q0))
    for lam_val in [0.0, 0.3, 1.0]:
        q = lambda_dyn.charges(q0, spec, jnp.array([lam_val]))
        # neutrality invariant: buffer absorbs the site's Δq at every λ
        assert np.isclose(float(jnp.sum(q)), total0, atol=1e-5)
    q1 = lambda_dyn.charges(q0, spec, jnp.array([1.0]))
    np.testing.assert_allclose(np.asarray(q1[2:4]), [-0.5, 0.0], atol=1e-6)


def test_dq_dlambda_dot_matches_autodiff():
    # dU/dλ via the φ·dq contraction must equal jax.grad of U(q(λ)) for a
    # quadratic electrostatic toy U = ½ qᵀ M q (so φ = ∂U/∂q = M q).
    spec = _toy_spec()
    n = 8
    rng = np.random.default_rng(0)
    M = rng.normal(size=(n, n))
    M = jnp.asarray((M + M.T) / 2, dtype=jnp.float32)
    q0 = jnp.asarray(rng.normal(size=n), dtype=jnp.float32)

    def U_of_lam(lam):
        q = lambda_dyn.charges(q0, spec, lam)
        return 0.5 * q @ M @ q

    lam = jnp.array([0.37])
    q = lambda_dyn.charges(q0, spec, lam)
    phi = M @ q
    got = lambda_dyn.dq_dlambda_dot(spec, phi)
    want = jax.grad(U_of_lam)(lam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4)


def test_lambda_force_is_minus_grad_of_site_energy():
    spec = _toy_spec()
    pH = jnp.array(7.0)
    T = 300.0

    def site_energy(lam):
        U_ph, _ = lambda_dyn.ph_energy(lam, spec, pH, T, P)
        U_b, _ = lambda_dyn.bias(lam, P)
        return jnp.sum(U_ph + U_b)

    lam = jnp.array([0.62])
    force, _ = lambda_dyn.lambda_force(
        lam, jnp.zeros(1), spec, pH, T, P
    )
    g = jax.grad(site_energy)(lam)
    np.testing.assert_allclose(np.asarray(force), -np.asarray(g), rtol=1e-4)


def test_stack_sites():
    s1 = _toy_spec()
    s2 = lambda_dyn.make_single_site(
        atom_idx=[0], q_prot=[0.3], q_deprot=[-0.3], pK=6.5
    )
    multi = lambda_dyn.stack_sites([s1, s2])
    assert multi.n_sites == 2
    assert multi.atom_idx.shape[0] == 2
    # padding must be masked out
    q0 = jnp.zeros(8, dtype=jnp.float32)
    q = lambda_dyn.charges(q0, multi, jnp.array([0.5, 0.5]))
    assert np.isclose(float(jnp.sum(q)), -0.3, atol=1e-5)  # site 2 has no buffer


def test_lambda_temperature():
    spec = _toy_spec()
    # set v so that ½ m v² = ½ kT  (1 dof at T)
    T = 300.0
    v = np.sqrt(units.BOLTZ * T / (20.0 * units.MVV2E))
    temp = lambda_dyn.lambda_temperature(jnp.array([v]), spec)
    assert np.isclose(float(temp), T, rtol=1e-5)
