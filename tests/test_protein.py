"""Multi-site solvated polypeptide (BASELINE config 4 family)."""
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu import lambda_dyn
from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.minimize import fire_minimize
from constant_ph_tpu.systems.protein import solvated_polypeptide


def test_build_and_short_run():
    sys_ = solvated_polypeptide(
        n_residues=8, sites_every=2, box_len=26.0, cutoff=8.0, seed=2)
    n = sys_.state.x.shape[0]
    S = sys_.spec.n_sites
    assert S == 4
    assert n > 1000
    # neutrality at several multi-site λ vectors
    q_tot0 = float(jnp.sum(sys_.ff.q0))
    lam = jnp.asarray(np.random.default_rng(0).uniform(0, 1, S),
                      dtype=jnp.float32)
    q = lambda_dyn.charges(sys_.ff.q0, sys_.spec, lam)
    assert abs(float(jnp.sum(q)) - q_tot0) < 1e-3

    cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0, gamma=0.01,
                       lambda_thermostat="langevin", rebuild_every=10)
    eng = sys_.make_engine(cfg)
    state, _ = fire_minimize(eng, sys_.state, n_steps=200)
    state, nbr, obs = eng.run(state, 200)
    h = np.asarray(obs.h_conserved)
    assert np.all(np.isfinite(h))
    lam_t = np.asarray(obs.lam)
    assert lam_t.shape[1] == S
    # per-site independent dU/dλ reported
    assert np.asarray(obs.dUdlam).shape[1] == S


def test_multisite_dUdlam_matches_autodiff():
    import jax

    sys_ = solvated_polypeptide(
        n_residues=6, sites_every=2, box_len=24.0, cutoff=8.0, seed=3)
    eng = sys_.make_engine(EngineConfig(rebuild_every=10))
    nbr = eng.build_neighbors(sys_.state.x, sys_.state.box)
    S = sys_.spec.n_sites

    from constant_ph_tpu.ops.pair import pair_forces

    def e_elec(lam):
        q = lambda_dyn.charges(sys_.ff.q0, sys_.spec, lam)
        pr = pair_forces(sys_.state.x, q, sys_.ff.type, sys_.state.box,
                         nbr, sys_.ff.pair)
        return pr.e_coul

    lam = jnp.asarray(np.linspace(0.2, 0.8, S), dtype=jnp.float32)
    q = lambda_dyn.charges(sys_.ff.q0, sys_.spec, lam)
    pr = pair_forces(sys_.state.x, q, sys_.ff.type, sys_.state.box,
                     nbr, sys_.ff.pair)
    got = lambda_dyn.dq_dlambda_dot(sys_.spec, pr.phi)
    want = jax.grad(e_elec)(lam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-3, atol=3e-3)


def test_dq_scale_neutrality_and_magnitude():
    """dq_scale shrinks every site's Δq linearly while the buffer keeps
    Σq exactly constant at any λ (Ewald-neutrality invariant)."""
    full = solvated_polypeptide(n_residues=8, sites_every=2, box_len=30.0,
                                cutoff=6.0, dq_scale=1.0)
    half = solvated_polypeptide(n_residues=8, sites_every=2, box_len=30.0,
                                cutoff=6.0, dq_scale=0.5)
    for sys_ in (full, half):
        S = sys_.spec.n_sites
        q0 = lambda_dyn.charges(sys_.ff.q0, sys_.spec, jnp.zeros(S))
        q1 = lambda_dyn.charges(sys_.ff.q0, sys_.spec, jnp.ones(S))
        np.testing.assert_allclose(float(jnp.sum(q1 - q0)), 0.0, atol=1e-5)
    dq_full = (lambda_dyn.charges(full.ff.q0, full.spec,
                                  jnp.ones(full.spec.n_sites))
               - full.ff.q0)
    dq_half = (lambda_dyn.charges(half.ff.q0, half.spec,
                                  jnp.ones(half.spec.n_sites))
               - half.ff.q0)
    np.testing.assert_allclose(np.asarray(dq_half), 0.5 * np.asarray(dq_full),
                               atol=1e-6)


def test_buffer_spreading_neutral_disjoint_and_bounded():
    """n_buffer_waters spreads each site's compensating +1e over N
    scattered waters: Σq stays exact at any λ, per-buffer-atom dq is
    1/(3N) of the site Δq, site buffer sets are disjoint, and an
    impossible request raises (systems/protein.py round-3 Marcus fix —
    the single-buffer layout put a 20.4 kcal/mol mid-λ PMF barrier on
    full-Δq titration, examples/results/buffer_barrier_probe.json)."""
    base = dict(n_residues=8, sites_every=2, box_len=26.0, cutoff=6.0,
                skin=1.2)
    one = solvated_polypeptide(n_buffer_waters=1, **base)
    four = solvated_polypeptide(n_buffer_waters=4, **base)
    for sys_ in (one, four):
        S = sys_.spec.n_sites
        for lam_v in (0.0, 0.37, 1.0):
            q = lambda_dyn.charges(sys_.ff.q0, sys_.spec,
                                   jnp.full((S,), lam_v))
            np.testing.assert_allclose(
                float(jnp.sum(q)) - float(jnp.sum(sys_.ff.q0)), 0.0,
                atol=2e-5)
        idx = np.asarray(sys_.spec.atom_idx)
        msk = np.asarray(sys_.spec.atom_mask)
        flat = idx[msk > 0]
        assert len(flat) == len(set(flat.tolist())), "buffer sets overlap"
    # buffer per-atom dq: -Σdq_site/(3N); site rows identical across builds
    dq1 = np.asarray(one.spec.dq)[0]
    dq4 = np.asarray(four.spec.dq)[0]
    np.testing.assert_allclose(dq1[:4], dq4[:4], atol=1e-7)   # acid atoms
    np.testing.assert_allclose(dq1[4:7], np.full(3, 1.0 / 3), atol=1e-6)
    np.testing.assert_allclose(dq4[4:16], np.full(12, 1.0 / 12), atol=1e-6)
    # impossible spread: more buffer waters than waters exist
    import pytest

    with pytest.raises(ValueError, match="buffer waters"):
        solvated_polypeptide(n_buffer_waters=10_000, **base)


def test_pme_rejects_odd_spline_order():
    """Odd-order cardinal B-splines have b(k)=0 at Nyquist (measured
    frel 3.2e-2 at p=5 vs 1e-4 at p=4/6, examples/probe_ewald_split.py
    --phase2); make_pme_params must refuse them."""
    import pytest

    from constant_ph_tpu.ops.pme import make_pme_params

    with pytest.raises(ValueError, match="even"):
        make_pme_params(np.array([30.0, 30.0, 30.0]), (3, 3, 3), 0.3,
                        spacing=1.2, p=5)
