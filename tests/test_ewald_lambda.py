"""BASELINE config 3: Ewald long-range electrostatics with the
reciprocal-space dU/dλ term. H conservation with λ coupled through BOTH
real and reciprocal space is the oracle for SURVEY.md §7.3 hard-part 1
("dU/dλ through the full electrostatics path")."""
import jax
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu import lambda_dyn
from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.minimize import fire_minimize
from constant_ph_tpu.ops.ewald import make_ewald_params, make_kspace_fn
from constant_ph_tpu.systems.water import solvated_acid


def _ewald_system(seed=11):
    sys_ = solvated_acid(
        n_side=4, rigid_water=False, lambda_coupled=True,
        T=200.0, cutoff=6.0, alpha=0.35, coul_style="cut", seed=seed,
    )
    ep = make_ewald_params(np.asarray(sys_.state.box), 0.35, accuracy=1e-5)
    return sys_, make_kspace_fn(ep)


def test_h_conservation_with_ewald_lambda():
    sys_, kfn = _ewald_system()
    cfg = EngineConfig(dt=0.25, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=20)
    eng = sys_.make_engine(cfg, kspace_fn=kfn)
    state, _ = fire_minimize(eng, sys_.state, n_steps=400)
    state, nbr, obs = eng.run(state, 600)
    h = np.asarray(obs.h_conserved, dtype=np.float64)
    ke = np.asarray(obs.ke, dtype=np.float64)
    lam = np.asarray(obs.lam)
    assert np.all(np.isfinite(h))
    assert np.std(lam) > 1e-5          # λ moving through recip coupling
    assert abs(h[-1] - h[0]) < 0.03 * np.mean(ke), (h[0], h[-1], ke.mean())
    assert np.std(h) < 0.03 * np.mean(ke)


def test_recip_dUdlam_matches_autodiff():
    # dU_rec/dλ via φ·dq against jax.grad of E_rec(q(λ)) — site + buffer
    sys_, kfn = _ewald_system(seed=12)
    spec = sys_.spec
    q0 = sys_.ff.q0
    x = sys_.state.x
    box = sys_.state.box

    def e_rec(lam):
        q = lambda_dyn.charges(q0, spec, lam)
        return kfn(x, q, box)[0]

    lam = jnp.array([0.41])
    q = lambda_dyn.charges(q0, spec, lam)
    _, _, phi, _ = kfn(x, q, box)
    got = lambda_dyn.dq_dlambda_dot(spec, phi)
    want = jax.grad(e_rec)(lam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_neutrality_preserved_under_ewald_titration():
    # the modify_water intent (fix_constant_pH.h:58): buffer keeps Σq fixed
    # at every λ so the Ewald background term stays constant
    sys_, _ = _ewald_system(seed=13)
    q_tot0 = float(jnp.sum(sys_.ff.q0))
    for lv in [0.0, 0.31, 0.77, 1.0]:
        q = lambda_dyn.charges(sys_.ff.q0, sys_.spec, jnp.array([lv]))
        assert abs(float(jnp.sum(q)) - q_tot0) < 1e-4
