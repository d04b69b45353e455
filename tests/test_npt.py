"""MC-barostat NPT (tiled/npt.py): molecular-scaling volume moves.

The reference fix is ensemble-agnostic, but its host world runs
constant-pH production at NpT — this is the ROADMAP item 4 capability.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.ops.ewald import make_ewald_params
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.npt import make_mc_barostat, npt_elastic_run
from constant_ph_tpu.tiled.layout import split_system, to_tiled


def _build(n_side=5, seed=9):
    sys_ = solvated_acid(
        n_side=n_side, rigid_water=True, lambda_coupled=True,
        cutoff=6.0, skin=1.5, coul_style="dsf", alpha=0.2, seed=seed,
        pH=5.0,
    )
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    return sys_, ts, tst


def _oh_distances(ts, tst):
    """All valid-water O-H distances (no PBC: molecules are whole)."""
    W = ts.params.W
    G = tst.wx.shape[1]
    xm = np.asarray(tst.wx).reshape(3, G, W, 3)
    v = np.asarray(tst.wvalid) > 0.5
    d1 = np.sqrt(((xm[:, :, :, 1] - xm[:, :, :, 0]) ** 2).sum(0))[v]
    d2 = np.sqrt(((xm[:, :, :, 2] - xm[:, :, :, 0]) ** 2).sum(0))[v]
    return np.concatenate([d1, d2])


def test_mc_move_preserves_rigid_geometry_and_scales_box():
    sys_, ts, tst = _build()
    cfg = EngineConfig(dt=1.0, thermostat="langevin", rebuild_every=10)
    eng = TiledEngine(ts, cfg)
    d0 = _oh_distances(ts, tst)
    move = jax.jit(make_mc_barostat(eng, pressure_atm=1.0, T=300.0,
                                    max_dlnV=0.02))
    accepted_once = False
    box0 = np.asarray(tst.box, np.float64)
    cur = tst
    for s in range(6):
        cur, acc = move(cur, jax.random.PRNGKey(s))
        accepted_once = accepted_once or bool(acc)
    assert accepted_once
    box1 = np.asarray(cur.box, np.float64)
    assert not np.allclose(box1, box0)
    # isotropic scaling
    r = box1 / box0
    np.testing.assert_allclose(r, r[0], rtol=1e-6)
    # molecular COM scaling preserves rigid geometry exactly (f32 eps)
    d1 = _oh_distances(ts, cur)
    np.testing.assert_allclose(d1, d0, atol=5e-5)


def test_mc_move_follows_pressure():
    """At absurdly high pressure the PV term dominates: accepted moves
    shrink the box; at strongly negative pressure they grow it."""
    sys_, ts, tst = _build()
    cfg = EngineConfig(dt=1.0, thermostat="langevin", rebuild_every=10)
    eng = TiledEngine(ts, cfg)

    def final_volume(p_atm):
        move = jax.jit(make_mc_barostat(eng, pressure_atm=p_atm, T=300.0,
                                        max_dlnV=0.01))
        cur = tst
        for s in range(12):
            cur, acc = move(cur, jax.random.PRNGKey(100 + s))
        b = np.asarray(cur.box, np.float64)
        return float(np.prod(b))

    v0 = float(np.prod(np.asarray(tst.box, np.float64)))
    assert final_volume(2.0e5) < v0
    assert final_volume(-2.0e5) > v0


def test_npt_kspace_refused():
    sys_, ts, tst = _build()
    cfg = EngineConfig(dt=1.0, rebuild_every=10)
    ep = make_ewald_params(np.asarray(sys_.state.box), 0.35, accuracy=1e-4)
    eng = TiledEngine(ts, cfg, kspace_ep=ep)
    # baked-box reciprocal params (no kspace_live_box) must be refused
    with pytest.raises(NotImplementedError, match="kspace_live_box"):
        make_mc_barostat(eng, pressure_atm=1.0, T=300.0)


@pytest.mark.acceptance
def test_npt_elastic_run_smoke():
    sys_, ts, tst = _build()
    cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0, gamma=0.01,
                       lambda_thermostat="langevin", rebuild_every=8,
                       force_cap=50.0)
    ts, tst, obs, info, stats = npt_elastic_run(
        ts, tst, cfg, 48, pressure_atm=1.0, chunk=16, max_dlnV=5e-3)
    assert stats["proposed"] == 3
    assert 0 <= stats["accepted"] <= 3
    assert len(stats["volume"]) == 3
    assert np.isfinite(np.asarray(obs.h_conserved)).all()
    assert np.isfinite(np.asarray(obs.temp)).all()


def test_pressure_observable():
    """Molecular-virial pressure (make_pressure_fn): a compressed liquid
    box reports much higher pressure than an expanded one (positive
    compressibility), and a near-ideal dilute box lands within a few
    hundred atm of N_mol kT/V (weak interactions at 6.4 A spacing)."""
    from constant_ph_tpu.tiled.npt import make_pressure_fn
    from constant_ph_tpu import units as u

    cfg = EngineConfig(dt=1.0, rebuild_every=10)

    # dilute, weakly-interacting box
    sys_d = solvated_acid(n_side=6, spacing=6.4, rigid_water=True,
                          lambda_coupled=True, cutoff=6.0, skin=1.5,
                          coul_style="dsf", alpha=0.2, seed=4, pH=5.0)
    ts_d = split_system(sys_d, skin=1.5)
    tst_d = to_tiled(ts_d, sys_d.state)
    eng_d = TiledEngine(ts_d, cfg)
    p_fn = jax.jit(make_pressure_fn(eng_d, T=300.0))
    p_dilute = float(p_fn(tst_d))
    v = float(np.prod(np.asarray(tst_d.box, np.float64)))
    n_mol = float(np.asarray(tst_d.wvalid).sum()) + 1
    p_ideal = n_mol * u.BOLTZ * 300.0 / v / u.ATM_A3_TO_KCAL
    assert abs(p_dilute - p_ideal) < max(300.0, 3.0 * p_ideal), (
        p_dilute, p_ideal)

    # liquid-density box: compressing by 5% must raise P by >> 100 atm
    sys_l, ts_l, tst_l = _build(seed=6)
    eng_l = TiledEngine(ts_l, cfg)
    p_fn_l = jax.jit(make_pressure_fn(eng_l, T=300.0))
    p0 = float(p_fn_l(tst_l))
    squeeze = 0.95 ** (1.0 / 3.0)
    from constant_ph_tpu.tiled.npt import make_mc_barostat  # noqa: F401
    # reuse the COM-scaling through a manual squeeze: scale water COMs
    W = ts_l.params.W
    G = tst_l.wx.shape[1]
    mp = np.asarray(ts_l.water.mass_pattern, np.float32)
    wx_m = np.asarray(tst_l.wx).reshape(3, G, W, 3)
    com = np.einsum("dgwa,a->dgw", wx_m, mp) / mp.sum()
    wx_new = (wx_m + (squeeze - 1.0) * com[..., None]).reshape(
        np.asarray(tst_l.wx).shape)
    tst_sq = tst_l.replace(
        wx=jnp.asarray(wx_new),
        sx=tst_l.sx * squeeze + (1 - squeeze) * tst_l.sx.mean(0),
        box=tst_l.box * squeeze)
    p1 = float(p_fn_l(tst_sq))
    assert p1 > p0 + 100.0, (p0, p1)


# ---------------------------------------------------------------------------
# NPT + k-space: live-box PME (ops/pme.pme_influence)
# ---------------------------------------------------------------------------

def _build_kspace(n_side=5, seed=9):
    sys_ = solvated_acid(
        n_side=n_side, rigid_water=True, lambda_coupled=True,
        cutoff=6.0, skin=1.5, coul_style="cut", alpha=0.35, seed=seed,
        pH=5.0,
    )
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    return sys_, ts, tst


def test_pme_live_box_matches_rebuilt_params():
    """Evaluating with params built at box0 + the LIVE box must equal
    evaluating with params REBUILT at the scaled box (the ground truth a
    volume move needs): energy, forces, and the λ-coupling φ."""
    from constant_ph_tpu.ops.pme import make_pme_params

    sys_, ts, tst = _build_kspace()
    box0 = np.asarray(sys_.state.box, np.float64)
    pp0 = make_pme_params(box0, ts.params.grid, 0.35, spacing=1.0, p=6)
    s = 1.015
    dt32 = tst.wx.dtype
    tst_s = tst.replace(wx=(tst.wx * s).astype(dt32),
                        sx=(tst.sx * s).astype(dt32),
                        box=(tst.box * s).astype(tst.box.dtype))

    cfg = EngineConfig(dt=1.0, thermostat="nve", lambda_thermostat="none",
                       kspace_live_box=True)
    eng_live = TiledEngine(ts, cfg, kspace_ep=pp0)
    f_live = eng_live.compute_forces(tst_s)

    # scale the target spacing with the box so the rebuilt params use the
    # SAME mesh shape (what the live path does: fixed mesh, scaled spacing)
    pp1 = make_pme_params(box0 * s, ts.params.grid, 0.35, spacing=1.0 * s,
                          p=6)
    assert pp1.mesh == pp0.mesh, "mesh changed; pick a smaller scale"
    cfg0 = EngineConfig(dt=1.0, thermostat="nve", lambda_thermostat="none")
    eng_ref = TiledEngine(ts, cfg0, kspace_ep=pp1)
    f_ref = eng_ref.compute_forces(tst_s)

    np.testing.assert_allclose(float(f_live.e_kspace),
                               float(f_ref.e_kspace), rtol=1e-5, atol=1e-3)
    scale = float(jnp.abs(f_ref.fw).max())
    vm = jnp.repeat(tst.wvalid, 3, axis=-1).reshape(1, -1)
    np.testing.assert_allclose(
        np.asarray(f_live.fw).reshape(3, -1) * np.asarray(vm) / scale,
        np.asarray(f_ref.fw).reshape(3, -1) * np.asarray(vm) / scale,
        atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_live.fs), np.asarray(f_ref.fs),
                               atol=1e-5 * scale)
    np.testing.assert_allclose(np.asarray(f_live.dUdlam),
                               np.asarray(f_ref.dUdlam), rtol=1e-4,
                               atol=1e-3)
    # and the live path at the BUILD box reproduces the baked fast path
    f_b = eng_live.compute_forces(tst)
    f_a = eng_ref_base = TiledEngine(ts, cfg0, kspace_ep=pp0).compute_forces(
        tst)
    np.testing.assert_allclose(float(f_b.e_kspace), float(f_a.e_kspace),
                               rtol=1e-5, atol=1e-3)


def test_npt_with_pme_live_box():
    """MC volume moves compose with PME when kspace_live_box is on; the
    baked-box configurations are refused."""
    from constant_ph_tpu.ops.pme import make_pme_params

    sys_, ts, tst = _build_kspace()
    box0 = np.asarray(sys_.state.box, np.float64)
    pp = make_pme_params(box0, ts.params.grid, 0.35, spacing=1.0, p=6)

    # refusals: PME without the flag; Ewald with the flag
    eng_frozen = TiledEngine(
        ts, EngineConfig(thermostat="langevin", rebuild_every=10),
        kspace_ep=pp)
    with pytest.raises(NotImplementedError, match="kspace_live_box"):
        make_mc_barostat(eng_frozen, pressure_atm=1.0, T=300.0)
    ep = make_ewald_params(box0, 0.35, accuracy=1e-5)
    with pytest.raises(ValueError, match="requires PME"):
        TiledEngine(ts, EngineConfig(kspace_live_box=True), kspace_ep=ep)
    with pytest.raises(ValueError, match="TiledEngine"):
        sys_.make_engine(EngineConfig(kspace_live_box=True))

    cfg = EngineConfig(dt=1.0, thermostat="langevin", rebuild_every=10,
                       kspace_live_box=True)
    eng = TiledEngine(ts, cfg, kspace_ep=pp)
    d0 = _oh_distances(ts, tst)
    move = jax.jit(make_mc_barostat(eng, pressure_atm=1.0, T=300.0,
                                    max_dlnV=0.02))
    cur, accepted_once = tst, False
    for s in range(6):
        cur, acc = move(cur, jax.random.PRNGKey(100 + s))
        accepted_once = accepted_once or bool(acc)
    assert accepted_once
    assert not np.allclose(np.asarray(cur.box), np.asarray(tst.box))
    np.testing.assert_allclose(_oh_distances(ts, cur), d0, atol=2e-4)
    # energies stay finite and box-consistent through the engine
    f = eng.compute_forces(cur)
    assert np.isfinite(float(f.e_pot))
