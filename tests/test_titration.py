"""Constant-pH physics acceptance (SURVEY.md §4 tiers 3-4).

1. λ-only sampling vs Henderson–Hasselbalch: with dq = 0 the λ Hamiltonian
   is f(λ)·kT·ln10·(pK−pH) + U_bias(λ), so the equilibrium deprotonated
   fraction must be 1/(1+10^(pK−pH)).
2. H_λ conservation with full electrostatic coupling — *the* correctness
   oracle for exact dU/dλ (fix_constant_pH.cpp:114's conserved quantity):
   any error in dU/dλ = Σ φ·dq leaks energy between λ and the atoms.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_ph_tpu import lambda_dyn, units
from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.lambda_dyn import BiasParams
from constant_ph_tpu.systems.water import solvated_acid


def _hh_fraction(pK, pH):
    return 1.0 / (1.0 + 10.0 ** (pK - pH))


# soft test landscape: same HH equilibrium as the Donnini defaults (wells
# symmetric, walls confine) but ~100× faster barrier crossing, so the
# sampling test converges in CI time. The default landscape's equilibrium
# is validated exactly in test_default_bias_equilibrium_is_hh below.
_SOFT = BiasParams(a=0.12, k=1.2, d=0.8)


@functools.partial(jax.jit, static_argnums=(2,))
def _sample_lambda(key, pH, n_steps, T=300.0, dt=0.5, gamma=0.05, pK=4.0):
    """BAOAB Langevin sampler on a single uncoupled λ, vmapped over chains."""
    p = _SOFT
    spec = lambda_dyn.make_single_site([0], [0.0], [0.0], pK=pK)
    m = spec.m_lambda
    inv_m = units.FTM2V / m
    c1 = jnp.exp(-gamma * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * units.BOLTZ * T / (m * units.MVV2E))

    def force(lam):
        F, _ = lambda_dyn.lambda_force(
            lam, jnp.zeros(1), spec, pH, T, p
        )
        return F

    def step(carry, k):
        lam, v, F = carry
        v = v + 0.5 * dt * F * inv_m
        lam = lam + 0.5 * dt * v
        v = c1 * v + c2 * jax.random.normal(k, v.shape)
        lam = lam + 0.5 * dt * v
        F = force(lam)
        v = v + 0.5 * dt * F * inv_m
        return (lam, v, F), (lam > 0.5)

    lam0 = jnp.array([0.5])
    v0 = jnp.zeros(1)
    keys = jax.random.split(key, n_steps)
    _, deprot = jax.lax.scan(step, (lam0, v0, force(lam0)), keys)
    return deprot


@pytest.mark.parametrize("dpH", [-1.0, 0.0, 0.5, 1.0])
def test_titration_matches_henderson_hasselbalch(dpH):
    pK = 4.0
    pH = pK + dpH
    n_chains = 64
    n_steps = 40_000
    keys = jax.random.split(jax.random.PRNGKey(int(10 * dpH) + 17), n_chains)
    deprot = jax.vmap(lambda k: _sample_lambda(k, jnp.array(pH), n_steps))(keys)
    # discard burn-in, average over chains and time
    frac = float(jnp.mean(deprot[:, n_steps // 4:]))
    want = _hh_fraction(pK, pH)
    assert abs(frac - want) < 0.05, (frac, want)


def test_default_bias_equilibrium_is_hh():
    """Exact Boltzmann integration over λ with the DEFAULT Donnini landscape
    must reproduce Henderson–Hasselbalch to <1e-3 — validates that the
    published constants (fix_constant_pH.cpp:86-94) give unbiased titration."""
    p = BiasParams()
    T = 300.0
    pK = 4.0
    lam = np.linspace(-0.4, 1.4, 40001)
    U_b, _ = lambda_dyn.bias(jnp.asarray(lam, dtype=jnp.float64), p)
    f, _ = lambda_dyn.switching(jnp.asarray(lam, dtype=jnp.float64), p)
    for dpH in [-1.0, -0.5, 0.5, 1.0, 2.0]:
        H = np.asarray(U_b) + np.asarray(f) * units.BOLTZ * T * units.LN10 * (-dpH)
        w = np.exp(-(H - H.min()) / (units.BOLTZ * T))
        frac = w[lam > 0.5].sum() / w.sum()
        assert abs(frac - _hh_fraction(pK, pK + dpH)) < 1e-3, dpH


def test_h_conservation_with_coupled_lambda():
    # NVE atoms + λ, flexible water, full electrostatic λ-coupling.
    from constant_ph_tpu.minimize import fire_minimize

    sys = solvated_acid(n_side=4, rigid_water=False, lambda_coupled=True,
                        T=200.0, cutoff=6.0, coul_style="dsf", alpha=0.2,
                        seed=5)
    cfg = EngineConfig(dt=0.25, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=20)
    eng = sys.make_engine(cfg)
    state, _ = fire_minimize(eng, sys.state, n_steps=400)
    state, nbr, obs = eng.run(state, 600)
    h = np.asarray(obs.h_conserved, dtype=np.float64)
    ke = np.asarray(obs.ke, dtype=np.float64)
    lam = np.asarray(obs.lam)
    assert np.all(np.isfinite(h))
    # λ must actually move (coupling alive)
    assert np.std(lam) > 1e-5
    drift = abs(h[-1] - h[0])
    assert drift < 0.02 * np.mean(ke), (drift, np.mean(ke))
    assert np.std(h) < 0.02 * np.mean(ke), (np.std(h), np.mean(ke))


def test_lambda_nevery_multiple_timestep():
    # impulse-MTS λ updates (ref nevery semantics, fix_constant_pH.cpp:69)
    from constant_ph_tpu.minimize import fire_minimize

    sys = solvated_acid(n_side=4, rigid_water=False, lambda_coupled=True,
                        T=200.0, cutoff=6.0, coul_style="dsf", alpha=0.2,
                        seed=6)
    cfg = EngineConfig(dt=0.25, thermostat="nve", lambda_thermostat="none",
                       lambda_nevery=4, rebuild_every=20)
    eng = sys.make_engine(cfg)
    state, _ = fire_minimize(eng, sys.state, n_steps=400)
    state, nbr, obs = eng.run(state, 400)
    h = np.asarray(obs.h_conserved, dtype=np.float64)
    ke = np.asarray(obs.ke, dtype=np.float64)
    assert np.all(np.isfinite(h))
    assert abs(h[-1] - h[0]) < 0.05 * np.mean(ke)


def test_compute_Hs_diagnostic():
    sys = solvated_acid(n_side=3, rigid_water=False, seed=7, cutoff=4.5)
    eng = sys.make_engine(EngineConfig(dt=0.5, rebuild_every=10))
    nbr = eng.build_neighbors(sys.state.x, sys.state.box)
    HA, HB = eng.compute_Hs(sys.state, nbr, sys.groupH_mask)
    frc = eng.compute_forces(sys.state.x, sys.state.lam, sys.state.box,
                             sys.state.pH, nbr)
    # HA = total tallied energy (pair + bonded), HB excludes the H share
    np.testing.assert_allclose(
        float(HA), float(frc.e_lj + frc.e_coul + frc.e_bonded), rtol=1e-4)
    assert float(HA) != float(HB)


def test_parse_class_offsets():
    from constant_ph_tpu import titration

    assert titration.parse_class_offsets("") == {}
    assert titration.parse_class_offsets(None) == {}
    assert titration.parse_class_offsets("4.25:-0.89, 6.5:0.12") == {
        4.25: -0.89, 6.5: 0.12}


def test_apply_dG_ref_per_class():
    """Per-pK-class ΔG_ref install (the per-site granularity of the
    reference fix's pK argument, fix_constant_pH.cpp:47): base constant
    plus class offsets land on exactly the matching sites; an offset for
    a pK no site has must raise (silent typo -> wrong landscape)."""
    from constant_ph_tpu import titration
    from constant_ph_tpu.systems.protein import solvated_polypeptide

    sys_ = solvated_polypeptide(n_residues=8, box_len=26.0,
                                water_spacing=3.4, cutoff=6.0, skin=1.2,
                                pH=5.0, n_buffer_waters=2)
    spec = titration.apply_dG_ref_per_class(
        sys_.spec, -10.0, {4.25: -0.5, 6.5: 0.25})
    pks = np.asarray(spec.pK)
    dg = np.asarray(spec.dG_ref)
    assert np.allclose(dg[np.abs(pks - 4.25) < 1e-3], -10.5)
    assert np.allclose(dg[np.abs(pks - 6.5) < 1e-3], -9.75)
    assert np.allclose(dg[np.abs(pks - 3.65) < 1e-3], -10.0)
    with pytest.raises(ValueError, match="no site has that pK"):
        titration.apply_dG_ref_per_class(sys_.spec, -10.0, {9.9: 1.0})
