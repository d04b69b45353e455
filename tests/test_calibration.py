"""ΔG_ref thermodynamic-integration machinery.

For a FIXED environment, U_elec(q(λ)) is quadratic in λ (linear q(λ),
pairwise Coulomb), so ⟨dU/dλ⟩(λ) is linear and Gauss–Legendre TI is exact:
ΔG_ref must equal U(λ=1) − U(λ=0) to quadrature/f32 precision.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_ph_tpu import lambda_dyn, titration
from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.ops.pair import pair_forces
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import split_system, to_tiled


def _static_dG_direct(sys_):
    """U_elec(λ=1) − U_elec(λ=0) on the frozen configuration."""
    eng = sys_.make_engine(EngineConfig(rebuild_every=10))
    nbr = eng.build_neighbors(sys_.state.x, sys_.state.box)

    def e_elec(lam):
        q = lambda_dyn.charges(sys_.ff.q0, sys_.spec, lam)
        pr = pair_forces(sys_.state.x, q, sys_.ff.type, sys_.state.box,
                         nbr, sys_.ff.pair)
        return float(pr.e_coul)

    return e_elec(jnp.array([1.0])) - e_elec(jnp.array([0.0]))


def test_ti_exact_on_static_environment():
    sys_ = solvated_acid(n_side=4, rigid_water=True, lambda_coupled=True,
                         cutoff=6.0, coul_style="dsf", alpha=0.2, seed=21)
    want = _static_dG_direct(sys_)

    # near-static dynamics: NVE from v=0, one sample step per window
    sys_ = dataclasses.replace(sys_, state=sys_.state.replace(
        v=jnp.zeros_like(sys_.state.v)))
    cfg = EngineConfig(dt=0.001, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=1)
    got = titration.calibrate_dG_ref(
        sys_, cfg, equil_steps=1, sample_steps=1, minimize_steps=0)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=0.1)


@pytest.mark.acceptance
def test_ti_tiled_matches_canonical():
    sys_ = solvated_acid(n_side=4, rigid_water=True, lambda_coupled=True,
                         cutoff=6.0, coul_style="dsf", alpha=0.2, seed=22)
    sys_ = dataclasses.replace(sys_, state=sys_.state.replace(
        v=jnp.zeros_like(sys_.state.v)))
    cfg = EngineConfig(dt=0.001, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=1)
    got_can = titration.calibrate_dG_ref(
        sys_, cfg, equil_steps=1, sample_steps=1, minimize_steps=0)

    ts = split_system(sys_)
    tst = to_tiled(ts, sys_.state)
    got_til = titration.calibrate_dG_ref_tiled(
        ts, tst, cfg, equil_steps=1, sample_steps=1)
    np.testing.assert_allclose(got_til, got_can, rtol=1e-3, atol=0.2)


def test_apply_dG_ref_shifts_equilibrium():
    # with dG_ref = kT·ln10·(pK−pH) exactly canceling the pH term, the site
    # energy landscape becomes the pure symmetric bias → force at λ=0.5 = 0
    from constant_ph_tpu import units
    from constant_ph_tpu.lambda_dyn import BiasParams

    spec = lambda_dyn.make_single_site([0], [0.0], [0.0], pK=4.0)
    pH, T = 6.0, 300.0
    dG = units.BOLTZ * T * units.LN10 * (4.0 - pH)
    spec2 = titration.apply_dG_ref(spec, dG)
    p = BiasParams()
    F, _ = lambda_dyn.lambda_force(jnp.array([0.5]), jnp.zeros(1), spec2,
                                   jnp.array(pH), T, p)
    assert abs(float(F[0])) < 1e-4
