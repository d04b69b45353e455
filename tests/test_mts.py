"""k-space impulse MTS (cfg.kspace_every, Verlet-I / r-RESPA outer level).

The reciprocal-space term is the slow force; with kspace_every = k it is
evaluated every k-th step and applied as a x k impulse in the half-kicks
around the boundary. This is the TPU analog of LAMMPS `run_style respa`
putting kspace on the outer level (the host substrate the reference fix
rides on, fix_constant_pH.cpp:241-244 kspace contract).

Correctness is phase-sensitive: the in-step boundary eval and the
block-start recompute in make_run must agree on which counter is a
boundary, or every rebuild injects a spurious extra half-impulse.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from constant_ph_tpu.engine import Engine, EngineConfig
from constant_ph_tpu.ops.ewald import make_ewald_params
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import split_system, to_tiled


def _build(n_side=5, seed=7):
    sys_ = solvated_acid(
        n_side=n_side, rigid_water=True, lambda_coupled=True,
        cutoff=6.0, skin=1.5, coul_style="cut", alpha=0.35, seed=seed,
        pH=5.0,
    )
    ep = make_ewald_params(np.asarray(sys_.state.box), 0.35, accuracy=1e-5)
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    return sys_, ts, tst, ep


@pytest.mark.acceptance
def test_mts_impulse_equals_every_step_at_frozen_positions():
    """Over one MTS period at vanishing dt (positions frozen), the total
    impulse delivered by the amplified boundary kicks must equal the
    every-step scheme's: velocities after 2k steps agree to O(dt^2)."""
    sys_, ts, tst, ep = _build()
    vs = {}
    for k in (1, 2):
        cfg = EngineConfig(dt=1e-5, thermostat="nve",
                           lambda_thermostat="none", rebuild_every=4,
                           kspace_every=k)
        eng = TiledEngine(ts, cfg, kspace_ep=ep)
        st, ov, obs = jax.jit(eng.make_run(4))(tst)
        vs[k] = (np.asarray(st.wv, np.float64), np.asarray(st.sv, np.float64))
    # velocity change per step is ~dt*F/m ~ 1e-5; schemes differ at O(dt^2)
    # (3e-6 rather than 1e-6: f32 summation-order noise on the amplified
    # boundary kicks)
    scale = np.abs(vs[1][0]).max()
    np.testing.assert_allclose(vs[2][0] / scale, vs[1][0] / scale, atol=3e-6)
    np.testing.assert_allclose(vs[2][1], vs[1][1], atol=scale * 3e-6)


@pytest.mark.acceptance
def test_mts_conserved_quantity_across_rebuild_boundaries():
    """NVE with k=2 across many rebuild blocks: the boundary-sampled
    conserved quantity must show no systematic drift (the block-start
    recompute bug injected +k*F*dt/2 of spurious k-space impulse per
    rebuild, a strong monotone drift)."""
    sys_, ts, tst, ep = _build()
    cfg_eq = EngineConfig(dt=0.5, thermostat="langevin", T=250.0, gamma=0.02,
                          lambda_thermostat="langevin", rebuild_every=8,
                          force_cap=50.0)
    eng_eq = TiledEngine(ts, cfg_eq, kspace_ep=ep)
    tst, _ = jax.jit(eng_eq.make_minimize(80))(tst)
    tst, ov, _ = jax.jit(eng_eq.make_run(120))(tst)
    assert not bool(ov)

    hs = {}
    for k in (1, 2):
        cfg = EngineConfig(dt=1.0, thermostat="nve", lambda_thermostat="none",
                           rebuild_every=8, kspace_every=k)
        eng = TiledEngine(ts, cfg, kspace_ep=ep)
        st, ov, obs = jax.jit(eng.make_run(240))(tst)
        assert not bool(ov)
        h = np.asarray(obs.h_conserved, np.float64)[k - 1::k]
        assert np.isfinite(h).all()
        hs[k] = h
    # fluctuation scale of the well-behaved every-step scheme
    sigma1 = max(float(np.std(hs[1])), 1e-8)
    # systematic drift over the k=2 run: end-vs-start window means
    h2 = hs[2]
    drift = abs(float(h2[-20:].mean() - h2[:20].mean()))
    # pre-fix this was ~60 blocks * impulse/2 >> sigma1; post-fix the
    # impulse scheme's O((k dt)^2) error stays within a few sigma
    assert drift < 12.0 * sigma1, (drift, sigma1)


def test_mts_validation():
    sys_, ts, tst, ep = _build()
    with pytest.raises(ValueError, match="kspace_every"):
        TiledEngine(ts, EngineConfig(kspace_every=0), kspace_ep=ep)
    # canonical Engine: MTS unsupported, must refuse rather than diverge
    with pytest.raises(ValueError, match="TiledEngine only"):
        sys_.make_engine(EngineConfig(kspace_every=2))
    # no kspace term -> kspace_every is inert
    TiledEngine(ts, EngineConfig(rebuild_every=10, kspace_every=4))


@pytest.mark.acceptance
def test_mts_stale_phi_lambda_force():
    """Between MTS boundaries the λ force keeps the previous boundary's
    reciprocal φ (mollified slow force) instead of dropping the term:
    over a few steps (same RNG key → near-identical trajectories) the
    k=3 dUdλ trace must track the k=1 trace, while the pair-only engine
    differs by the full reciprocal contribution."""
    sys_, ts, tst, ep = _build()

    def du_trace(k, kspace):
        cfg = EngineConfig(dt=0.5, thermostat="langevin", T=250.0,
                           gamma=0.01, rebuild_every=6, kspace_every=k)
        eng = TiledEngine(ts, cfg, kspace_ep=ep if kspace else None)
        st, ov, obs = jax.jit(eng.make_run(6))(tst)
        return np.asarray(obs.dUdlam, np.float64)

    du1 = du_trace(1, True)
    du3 = du_trace(3, True)
    du_pair = du_trace(1, False)
    assert np.isfinite(du3).all()
    recip = np.abs(du1 - du_pair).max()       # the term at stake
    assert recip > 1e-3                       # kspace φ actually matters
    # stale-φ error accumulates over the 2 off-boundary steps and resets
    # at boundaries; it must stay well below dropping the term entirely
    # (which would show ≈ recip at every off-boundary step)
    assert np.abs(du3 - du1).max() < 0.25 * recip + 0.05, (
        np.abs(du3 - du1).max(), recip)
    # boundary rows are exact up to trajectory divergence
    assert np.abs(du3 - du1)[2::3].max() < 0.02 * recip + 0.05


@pytest.mark.acceptance
def test_mts_phi_carry_across_run_invocations():
    """The k-space MTS carry lives in TiledState: two chained make_run
    chunks whose boundary does NOT land on a kspace_every multiple must
    reproduce one continuous run (regression: the carry used to re-init
    to zeros per make_run invocation, dropping the reciprocal λ force
    for up to k-1 steps at every elastic/NPT chunk start)."""
    sys_, ts, tst, ep = _build()
    cfg = EngineConfig(dt=0.5, thermostat="langevin", T=250.0, gamma=0.01,
                       rebuild_every=2, kspace_every=4)
    eng = TiledEngine(ts, cfg, kspace_ep=ep)

    st_cont, _, obs_cont = jax.jit(eng.make_run(12))(tst)

    run6 = jax.jit(eng.make_run(6))
    st_a, _, obs_a = run6(tst)             # steps 0..5
    assert float(jnp.abs(st_a.phi_recip_s).max()) > 0.0
    st_b, _, obs_b = run6(st_a)            # starts at step 6 (6 % 4 != 0)
    du_chunked = np.concatenate([np.asarray(obs_a.dUdlam),
                                 np.asarray(obs_b.dUdlam)])
    np.testing.assert_allclose(du_chunked, np.asarray(obs_cont.dUdlam),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_b.wx), np.asarray(st_cont.wx),
                               rtol=1e-6, atol=1e-5)
