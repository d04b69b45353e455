"""Tiled (TPU hot-path) engine vs the canonical neighbor-list engine.

The canonical engine.Engine is the semantic reference; the tiled path must
reproduce its energies, forces, φ, and dU/dλ on the same configuration
(SURVEY.md §5.2's kernel-vs-reference "sanitizer" policy), and conserve
energy through its own dynamics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from constant_ph_tpu.engine import Engine, EngineConfig
from constant_ph_tpu.ops.ewald import make_ewald_params, make_kspace_fn
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import (
    rebin,
    split_system,
    to_canonical,
    to_tiled,
)


def _tiled_forces_to_canonical(ts, tstate, frc):
    """Map tiled force arrays back to canonical atom order (test helper)."""
    n = ts.n_atoms
    f = np.zeros((n, 3))
    wid = np.asarray(tstate.wid)
    valid = np.asarray(tstate.wvalid) > 0.5
    fw = np.asarray(frc.fw)          # (3, G, 3W)
    G, W = wid.shape
    for c in range(G):
        for s in range(W):
            if not valid[c, s]:
                continue
            ids = ts.water_atom_ids[wid[c, s]]
            for a in range(3):
                f[ids[a]] = fw[:, c, 3 * s + a]
    f[ts.solute_ids] = np.asarray(frc.fs)[: len(ts.solute_ids)]
    return f


def _build(style="dsf", alpha=0.2, n_side=4, seed=3):
    sys_ = solvated_acid(
        n_side=n_side, rigid_water=True, lambda_coupled=True,
        cutoff=6.0, skin=1.5, coul_style=style, alpha=alpha, seed=seed,
        pH=5.0,
    )
    cfg = EngineConfig(dt=1.0, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=10)
    return sys_, cfg


@pytest.mark.parametrize("style,alpha", [("dsf", 0.2), ("cut", 0.0)])
def test_tiled_matches_reference_engine(style, alpha):
    sys_, cfg = _build(style=style, alpha=alpha)
    ref = sys_.make_engine(cfg)
    nbr = ref.build_neighbors(sys_.state.x, sys_.state.box)
    rf = ref.compute_forces(sys_.state.x, sys_.state.lam, sys_.state.box,
                            sys_.state.pH, nbr)

    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    eng = TiledEngine(ts, cfg)
    tf = eng.compute_forces(tst)

    np.testing.assert_allclose(float(tf.e_lj), float(rf.e_lj), rtol=2e-4)
    np.testing.assert_allclose(float(tf.e_coul), float(rf.e_coul), rtol=2e-4)
    np.testing.assert_allclose(float(tf.e_bonded), float(rf.e_bonded),
                               rtol=1e-4)

    f_t = _tiled_forces_to_canonical(ts, tst, tf)
    f_r = np.asarray(rf.f)
    scale = np.abs(f_r).max()
    np.testing.assert_allclose(f_t / scale, f_r / scale, atol=3e-5)

    # exact dU/dλ parity (φ path through both blocks)
    np.testing.assert_allclose(np.asarray(tf.dUdlam), np.asarray(rf.dUdlam),
                               rtol=5e-4, atol=5e-3)
    np.testing.assert_allclose(np.asarray(tf.f_lam), np.asarray(rf.f_lam),
                               rtol=5e-4, atol=5e-3)


def test_tiled_eatom_sums_to_total():
    sys_, cfg = _build()
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    eng = TiledEngine(ts, cfg)
    tf = eng.compute_forces(tst)
    vm = jnp.repeat(tst.wvalid, 3, axis=-1)
    total = float(jnp.sum(tf.eatom_w * vm)
                  + jnp.sum(tf.eatom_s * ts.solute.smask))
    want = float(tf.e_lj + tf.e_coul + tf.e_bonded)
    np.testing.assert_allclose(total, want, rtol=1e-4)
    HA, HB = eng.compute_Hs(tst, tf)
    np.testing.assert_allclose(float(HA), want, rtol=1e-4)
    assert float(HA) != float(HB)


def test_rebin_preserves_energy():
    sys_, cfg = _build(seed=5)
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    eng = TiledEngine(ts, cfg)
    e0 = float(eng.compute_forces(tst).e_pot)
    # move everything by a shift that crosses cell boundaries, then rebin
    shift = jnp.asarray([3.7, -2.1, 5.9], dtype=tst.wx.dtype)
    tst2 = tst.replace(
        wx=tst.wx + shift[:, None, None],
        sx=tst.sx + shift[None, :],
    )
    tst2, overflow = rebin(tst2, ts.params)
    assert not bool(overflow)
    e1 = float(eng.compute_forces(tst2).e_pot)
    np.testing.assert_allclose(e1, e0, rtol=1e-5)


def test_roundtrip_canonical_tiled():
    sys_, cfg = _build(seed=7)
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    back = to_canonical(ts, tst)
    np.testing.assert_allclose(np.asarray(back.x), np.asarray(sys_.state.x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(back.v), np.asarray(sys_.state.v),
                               atol=1e-6)


@pytest.mark.acceptance
def test_tiled_nve_conservation_with_lambda():
    sys_, _ = _build(seed=9)
    cfg = EngineConfig(dt=1.0, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=10)
    ts = split_system(sys_, skin=1.5)
    # relax with the reference engine's minimizer first
    from constant_ph_tpu.minimize import fire_minimize
    ref = sys_.make_engine(cfg)
    state, _ = fire_minimize(ref, sys_.state, n_steps=300)
    tst = to_tiled(ts, state)
    eng = TiledEngine(ts, cfg)
    tst, overflow, obs = eng.run(tst, 400)
    assert not bool(overflow)
    h = np.asarray(obs.h_conserved, dtype=np.float64)
    ke = np.asarray(obs.ke, dtype=np.float64)
    lam = np.asarray(obs.lam)
    assert np.all(np.isfinite(h))
    assert np.std(lam) > 1e-6
    assert abs(h[-1] - h[0]) < 0.03 * np.mean(ke), (h[0], h[-1], ke.mean())


def test_tiled_ewald_matches_reference():
    sys_, cfg = _build(style="cut", alpha=0.35)
    ep = make_ewald_params(np.asarray(sys_.state.box), 0.35, accuracy=1e-5)
    ref = sys_.make_engine(cfg, kspace_fn=make_kspace_fn(ep))
    nbr = ref.build_neighbors(sys_.state.x, sys_.state.box)
    rf = ref.compute_forces(sys_.state.x, sys_.state.lam, sys_.state.box,
                            sys_.state.pH, nbr)

    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    eng = TiledEngine(ts, cfg, kspace_ep=ep)
    tf = eng.compute_forces(tst)

    # recip totals differ by the constant rigid-water intra correction the
    # canonical path puts in real space; compare the combined Coulomb total
    tot_ref = float(rf.e_coul + rf.e_kspace)
    tot_til = float(tf.e_coul + tf.e_kspace)
    # canonical path accumulates the ±2500 kcal/mol intra-water erf terms in
    # f32; the tiled path replaces them with an exact constant → small noise
    np.testing.assert_allclose(tot_til, tot_ref, rtol=3e-3)
    f_t = _tiled_forces_to_canonical(ts, tst, tf)
    f_r = np.asarray(rf.f)
    scale = np.abs(f_r).max()
    # intra-molecular erf-correction forces differ (constraint-direction
    # only, projected out by SHAKE) — compare solute + water-O forces
    sol = np.zeros(len(f_r), dtype=bool)
    sol[ts.solute_ids] = True
    np.testing.assert_allclose(f_t[sol] / scale, f_r[sol] / scale, atol=2e-4)
    np.testing.assert_allclose(np.asarray(tf.dUdlam), np.asarray(rf.dUdlam),
                               rtol=1e-3, atol=1e-2)


@pytest.mark.acceptance
def test_fast_ww_matches_tally_path():
    """water_water_fast (hot path: parked invalid slots, per-cell-shift PBC,
    O-O-only LJ, no tallies) vs the masked tally oracle on a grid ≥ 3
    system, including after a rebin that wraps/parks."""
    sys_ = solvated_acid(
        n_side=9, rigid_water=True, lambda_coupled=True,
        cutoff=6.0, skin=1.5, coul_style="dsf", alpha=0.2, seed=11, pH=5.0,
    )
    cfg = EngineConfig(dt=1.0, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=10)
    ts = split_system(sys_, skin=1.5)
    assert min(ts.params.grid) >= 3, ts.params.grid
    tst = to_tiled(ts, sys_.state)
    eng = TiledEngine(ts, cfg)

    for trial in range(2):
        tf_fast = eng.compute_forces(tst)                  # fast path
        tf_ref = eng.compute_forces(tst, need_tally=True)  # oracle path
        np.testing.assert_allclose(float(tf_fast.e_lj), float(tf_ref.e_lj),
                                   rtol=2e-5)
        np.testing.assert_allclose(float(tf_fast.e_coul),
                                   float(tf_ref.e_coul), rtol=2e-5)
        scale = float(jnp.abs(tf_ref.fw).max())
        np.testing.assert_allclose(np.asarray(tf_fast.fw) / scale,
                                   np.asarray(tf_ref.fw) / scale, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tf_fast.fs),
                                   np.asarray(tf_ref.fs), atol=1e-3)
        np.testing.assert_allclose(np.asarray(tf_fast.dUdlam),
                                   np.asarray(tf_ref.dUdlam),
                                   rtol=5e-4, atol=5e-3)
        # second trial: shift across cells + rebin (exercises wrap + park)
        shift = jnp.asarray([4.3, -1.7, 7.9], dtype=tst.wx.dtype)
        tst = tst.replace(wx=tst.wx + shift[:, None, None],
                          sx=tst.sx + shift[None, :])
        tst, overflow = rebin(tst, ts.params)
        assert not bool(overflow)


def test_retile_auto_cost_model():
    """retile_auto picks the cheapest padded-lane W, not blind occ+margin:
    at occ 51 the 128-lane quantization makes W=56 (A=168, chunk 3x168=504
    just under 512) ~15% cheaper than W=60 (A=180)."""
    from constant_ph_tpu.tiled.layout import _pair_cost

    assert _pair_cost(56) < _pair_cost(60)
    costs = {w: _pair_cost(w) for w in range(56, 64, 4)}
    assert min(costs, key=costs.get) == 56


@pytest.mark.acceptance
def test_retile_capacity():
    """retile() shrinks W and preserves state + energies exactly."""
    from constant_ph_tpu.tiled.layout import retile

    sys_ = solvated_acid(
        n_side=9, rigid_water=True, lambda_coupled=True,
        cutoff=6.0, skin=1.5, coul_style="dsf", alpha=0.2, seed=13, pH=5.0,
    )
    cfg = EngineConfig(dt=1.0, thermostat="nve", lambda_thermostat="none")
    ts = split_system(sys_, skin=1.5, tile_safety=2.2)
    tst = to_tiled(ts, sys_.state)
    eng = TiledEngine(ts, cfg)
    e0 = float(eng.compute_forces(tst).e_pot)

    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    ts2, tst2 = retile(ts, tst, occ + 4)
    assert ts2.params.W < ts.params.W
    eng2 = TiledEngine(ts2, cfg)
    e1 = float(eng2.compute_forces(tst2).e_pot)
    np.testing.assert_allclose(e1, e0, rtol=1e-5)


@pytest.mark.acceptance
def test_pme_matches_factorized_ewald():
    """FFT-based PME (ops/pme.py, scatter-free tile spreading) vs the
    factorized-matmul Ewald oracle through the full tiled engine: energy,
    forces, dU/dλ, and the eatom tally path."""
    from constant_ph_tpu.ops.pme import make_pme_params

    sys_ = solvated_acid(
        n_side=9, rigid_water=True, lambda_coupled=True,
        cutoff=6.0, skin=1.5, coul_style="cut", alpha=0.35, seed=3, pH=5.0,
    )
    cfg = EngineConfig(dt=1.0, thermostat="nve", lambda_thermostat="none")
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    box = np.asarray(sys_.state.box)

    ep = make_ewald_params(box, 0.35, accuracy=1e-6)
    pp = make_pme_params(box, ts.params.grid, 0.35, spacing=1.0, p=6)
    eng_ew = TiledEngine(ts, cfg, kspace_ep=ep)
    eng_pm = TiledEngine(ts, cfg, kspace_ep=pp)

    tf_ew = eng_ew.compute_forces(tst)
    tf_pm = eng_pm.compute_forces(tst)

    # PME mesh-discretization error is ~0.1 kcal/mol absolute on this system
    # (2e-6 of the raw recip sum; e_kspace is a small cancellation residual)
    np.testing.assert_allclose(float(tf_pm.e_kspace), float(tf_ew.e_kspace),
                               atol=0.3)
    scale = float(jnp.abs(tf_ew.fw).max())
    vm = jnp.repeat(tst.wvalid, 3, axis=-1)[None]
    np.testing.assert_allclose(
        np.asarray(tf_pm.fw * vm) / scale,
        np.asarray(tf_ew.fw * vm) / scale, atol=5e-4)
    np.testing.assert_allclose(np.asarray(tf_pm.fs), np.asarray(tf_ew.fs),
                               atol=5e-4 * scale)
    np.testing.assert_allclose(np.asarray(tf_pm.dUdlam),
                               np.asarray(tf_ew.dUdlam), rtol=2e-3,
                               atol=1e-2)

    # tally path: eatom sums to the total (kspace included)
    tf_t = eng_pm.compute_forces(tst, need_tally=True)
    total = float(jnp.sum(tf_t.eatom_w * vm[0])
                  + jnp.sum(tf_t.eatom_s * ts.solute.smask))
    want = float(tf_t.e_lj + tf_t.e_coul + tf_t.e_bonded
                 + tf_t.e_kspace - eng_pm.e_corr)
    np.testing.assert_allclose(total, want, rtol=1e-3)

    # NVE conservation with PME λ-coupled electrostatics
    from constant_ph_tpu.minimize import fire_minimize
    ref = sys_.make_engine(cfg)
    state, _ = fire_minimize(ref, sys_.state, n_steps=200)
    tst2 = to_tiled(ts, state)
    tst2, overflow, obs = eng_pm.run(tst2, 200)
    assert not bool(overflow)
    h = np.asarray(obs.h_conserved, np.float64)
    ke = np.asarray(obs.ke, np.float64)
    assert np.isfinite(h).all()
    assert abs(h[-1] - h[0]) < 0.05 * ke.mean(), (h[0], h[-1], ke.mean())


@pytest.mark.acceptance
def test_elastic_run_grows_capacity():
    """elastic_run must grow W on the early overflow flag without losing
    molecules (the grow-on-overflow analog of LAMMPS memory->grow)."""
    from constant_ph_tpu.tiled.elastic import elastic_run
    from constant_ph_tpu.tiled.layout import retile

    sys_ = solvated_acid(
        n_side=8, rigid_water=True, lambda_coupled=True,
        cutoff=6.0, skin=1.5, coul_style="dsf", alpha=0.2, seed=5, pH=5.0,
    )
    cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0, gamma=0.01,
                       lambda_thermostat="langevin", rebuild_every=5)
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    eng = TiledEngine(ts, cfg)
    tst, _ = jax.jit(eng.make_minimize(100))(tst)

    # retile down to the tightest capacity that still fits RIGHT NOW —
    # thermal occupancy fluctuation will trip the early flag quickly
    occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
    W_tight = max(4, -(-occ // 4) * 4)
    ts, tst = retile(ts, tst, W_tight)
    n_waters = int(np.asarray(tst.wvalid).sum())

    ts2, tst2, obs, info = elastic_run(
        ts, tst, cfg, 200, chunk=20, margin_min=4,
        device=jax.devices()[0])
    assert int(np.asarray(tst2.wvalid).sum()) == n_waters
    assert ts2.params.W >= W_tight
    assert obs.temp.shape[0] == 200
    assert bool(jnp.all(jnp.isfinite(obs.h_conserved)))
    # the tight retile makes at least one growth likely but not certain;
    # the invariants above are the real assertions — just exercise info
    assert info.final_W == ts2.params.W
