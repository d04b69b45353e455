"""Well-tempered λ-metadynamics (constant_ph_tpu/metad.py).

Key acceptance: on the DEFAULT Donnini landscape — whose ~10 kT barriers
make direct λ sampling too slow for CI (tests/test_titration.py uses a
softened landscape for that reason) — the metadynamics free-energy
estimator must reproduce Henderson–Hasselbalch titration.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from constant_ph_tpu import lambda_dyn, metad, units
from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.lambda_dyn import BiasParams
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import split_system, to_tiled


def _hh_fraction(pK, pH):
    return 1.0 / (1.0 + 10.0 ** (pK - pH))


def test_lookup_matches_analytic_hill_sum():
    """The grid tables must reproduce the analytic sum of deposited
    Gaussians (energy AND derivative) to grid-interpolation accuracy —
    the hill centers/heights are reconstructed alongside the deposits."""
    mp = metad.MetadParams(nbins=241, sigma=0.04, h0=0.5, gamma=6.0)
    kT = units.BOLTZ * mp.T
    V, dV = metad.init_tables(2, mp)
    key = jax.random.PRNGKey(0)
    centers, heights = [], []
    for i in range(20):
        lam = jax.random.uniform(jax.random.fold_in(key, i), (2,),
                                 minval=0.0, maxval=1.0)
        v_at, _ = metad.lookup(V, dV, lam, mp)
        heights.append(mp.h0 * np.exp(-np.asarray(v_at, np.float64)
                                      / ((mp.gamma - 1.0) * kT)))
        centers.append(np.asarray(lam, np.float64))
        V, dV = metad.deposit(V, dV, lam, mp)
    c = np.stack(centers)          # (H, 2)
    h = np.stack(heights)          # (H, 2)

    lam0 = np.asarray([0.31, 0.77])
    x = lam0[None, :] - c                                  # (H, 2)
    g = np.exp(-x * x / (2.0 * mp.sigma ** 2))
    v_want = (h * g).sum(axis=0)
    # d/dλ0 of h·exp(−(λ0−c)²/2σ²) = −(λ0−c)/σ² · (…)
    dv_want = (h * (-x / mp.sigma ** 2) * g).sum(axis=0)
    v, dv = metad.lookup(V, dV, jnp.asarray(lam0, jnp.float32), mp)
    np.testing.assert_allclose(np.asarray(v), v_want,
                               rtol=2e-2, atol=1e-3)
    np.testing.assert_allclose(np.asarray(dv), dv_want,
                               rtol=3e-2, atol=3e-2 * abs(dv_want).max())


def test_well_tempered_hills_decay():
    mp = metad.MetadParams(nbins=121, sigma=0.05, h0=0.5, gamma=4.0)
    V, dV = metad.init_tables(1, mp)
    lam = jnp.asarray([0.5])
    tops = []
    for _ in range(30):
        V, dV = metad.deposit(V, dV, lam, mp)
        tops.append(float(V.max()))
    incr = np.diff([0.0] + tops)
    assert np.all(incr > 0)
    assert incr[-1] < 0.25 * incr[0]          # strong WT damping
    # bounded by the WT ceiling (γ−1)·kT·ln(...) scale: V < (γ−1)kT·lnΓ…
    # just check it is far below the unbounded 30·h0
    assert tops[-1] < 0.7 * 30 * mp.h0


@functools.partial(jax.jit, static_argnums=(2, 3))
def _metad_sample(key, pH, n_steps, mp, T=300.0, dt=0.5, gamma_l=0.05,
                  pK=4.0):
    """Langevin λ sampler on the DEFAULT Donnini landscape with WT-metad
    deposits every mp.stride steps; returns (final bias table, per-step
    deprotonated-fraction estimator trace)."""
    p = BiasParams()
    spec = lambda_dyn.make_single_site([0], [0.0], [0.0], pK=pK)
    m = spec.m_lambda
    inv_m = units.FTM2V / m
    c1 = jnp.exp(-gamma_l * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * units.BOLTZ * T / (m * units.MVV2E))
    V0, dV0 = metad.init_tables(1, mp)

    def force(lam, V, dV):
        F, _ = lambda_dyn.lambda_force(lam, jnp.zeros(1), spec, pH, T, p)
        _, dvb = metad.lookup(V, dV, lam, mp)
        return F - dvb

    def step(carry, xs):
        i, k = xs
        lam, v, V, dV = carry
        F = force(lam, V, dV)
        v = v + 0.5 * dt * F * inv_m
        lam = lam + 0.5 * dt * v
        v = c1 * v + c2 * jax.random.normal(k, v.shape)
        lam = lam + 0.5 * dt * v
        F = force(lam, V, dV)
        v = v + 0.5 * dt * F * inv_m
        V, dV = jax.lax.cond(
            i % mp.stride == 0,
            lambda t: metad.deposit(t[0], t[1], lam, mp),
            lambda t: t, (V, dV))
        return (lam, v, V, dV), metad.deprotonated_fraction(V, mp)[0]

    keys = jax.random.split(key, n_steps)
    idx = jnp.arange(n_steps)
    (lam, v, V, dV), frac = jax.lax.scan(
        step, (jnp.array([0.0]), jnp.zeros(1), V0, dV0), (idx, keys))
    return V, frac


@pytest.mark.parametrize("dpH", [-1.0, 0.0, 1.0])
def test_metad_estimator_matches_hh_on_default_landscape(dpH):
    """Direct sampling of the default landscape needs ~10⁷ steps per
    crossing; metadynamics converges the SAME observable via the bias
    profile in ~10⁵ steps. Protocol matters (measured in round 3):
    the hill pace must be slow vs the λ relaxation (~20 fs period →
    one hill per 50 fs, stride=100 at dt=0.5), and the production
    estimator is the TAIL-TIME-AVERAGED basin fraction over a few
    independent walkers (single final-snapshot estimates fluctuate
    ±0.1 with the most recent hill flux)."""
    pK = 4.0
    n, chains = 200_000, 4
    mp = metad.MetadParams(nbins=241, sigma=0.02, h0=0.25, gamma=15.0,
                           stride=100)
    keys = jax.random.split(jax.random.PRNGKey(int(3 * dpH) + 7), chains)
    _, frac = jax.vmap(
        lambda k: _metad_sample(k, jnp.array(pK + dpH), n, mp))(keys)
    est = float(np.asarray(frac)[:, n // 2:].mean())
    want = _hh_fraction(pK, pK + dpH)
    assert abs(est - want) < 0.07, (est, want)


@pytest.mark.acceptance
def test_engine_metad_deposits_and_drives_crossings():
    """Tiled-engine integration: with metadynamics on, hill tables grow
    and λ crosses the (default, ~10 kT) barrier within a short CPU run;
    without it, λ stays in its starting basin (pH ≪ pK keeps the
    protonated well strongly favored; reduced Δq keeps the landscape
    the known bias+pH one — full-Δq needs the TI-calibrated dG_ref,
    which is the production drivers' job, not this integration test's)."""
    sys_ = solvated_acid(
        n_side=3, rigid_water=True, lambda_coupled=0.1,
        cutoff=4.5, skin=1.5, coul_style="dsf", alpha=0.2, seed=11, pH=2.0,
    )
    ts = split_system(sys_, skin=1.5)
    # start λ INSIDE the protonated basin, not on the barrier top
    lam0_v = jnp.full_like(sys_.state.lam, 0.05)
    tst = to_tiled(ts, sys_.state).replace(lam=lam0_v)
    cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0, gamma=0.01,
                       lambda_thermostat="langevin", rebuild_every=10)
    mp = metad.MetadParams(nbins=121, sigma=0.03, h0=0.6, gamma=20.0,
                           stride=30)
    n_sites = ts.spec.n_sites
    V0, dV0 = metad.init_tables(n_sites, mp)
    tst_m = tst.replace(metad_v=V0, metad_dv=dV0)

    eng0 = TiledEngine(ts, cfg)
    eng_m = TiledEngine(ts, cfg, metad=mp)

    run0 = jax.jit(eng0.make_run(1500))
    runm = jax.jit(eng_m.make_run(1500))
    _, _, obs0 = run0(tst)
    stm, _, obsm = runm(tst_m)

    lam0 = np.asarray(obs0.lam)
    lamm = np.asarray(obsm.lam)
    assert float(jnp.abs(stm.metad_v).max()) > 0.1          # hills landed
    # the unbiased run stays in the λ≈0 basin; metad escapes it
    assert lam0.max() < 0.5, lam0.max()
    assert lamm.max() > 0.5, lamm.max()

    # missing tables with metad enabled is a clear trace-time error
    with pytest.raises(ValueError, match="metadynamics tables"):
        eng_m.compute_forces(tst)


@pytest.mark.acceptance
def test_frozen_metad_bias_conserves_h():
    """A frozen (static) metadynamics bias is a conservative potential:
    NVE + λ with the bias must conserve H_λ (the e_site bookkeeping and
    the interpolated force stay consistent)."""
    sys_ = solvated_acid(
        n_side=3, rigid_water=True, lambda_coupled=True,
        cutoff=4.5, skin=1.5, coul_style="dsf", alpha=0.2, seed=12, pH=4.0,
    )
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    mp = metad.MetadParams(nbins=121, sigma=0.05, h0=0.5, gamma=8.0)
    V, dV = metad.init_tables(ts.spec.n_sites, mp)
    # pre-cooked static bias: a few hills around the start basin
    for lam_c in (0.0, 0.05, 0.1):
        V, dV = metad.deposit(
            V, dV, jnp.full((ts.spec.n_sites,), lam_c), mp)
    tst = tst.replace(metad_v=V, metad_dv=dV)

    from constant_ph_tpu.minimize import fire_minimize
    ref_eng = sys_.make_engine(EngineConfig(rebuild_every=10))
    state, _ = fire_minimize(ref_eng, sys_.state, n_steps=300)
    tst = to_tiled(ts, state).replace(metad_v=V, metad_dv=dV)

    cfg = EngineConfig(dt=0.25, thermostat="nve", lambda_thermostat="none",
                       rebuild_every=20)
    eng = TiledEngine(ts, cfg, metad=mp, metad_frozen=True)
    st, ov, obs = jax.jit(eng.make_run(400))(tst)
    assert not bool(ov)
    h = np.asarray(obs.h_conserved, np.float64)
    ke = np.asarray(obs.ke, np.float64)
    assert np.isfinite(h).all()
    assert abs(h[-1] - h[0]) < 0.03 * np.mean(ke), (
        abs(h[-1] - h[0]), np.mean(ke))
    # frozen ⇒ tables unchanged
    np.testing.assert_array_equal(np.asarray(st.metad_v), np.asarray(V))


@pytest.mark.acceptance
def test_metad_per_site_calibration_uncoupled():
    """calibrate_dG_ref_metad fixed point: with dq = 0 and dG_ref = 0 the
    landscape is exactly bias + pH term, whose basin ΔF already equals the
    HH target at any pH — so the calibrated per-site correction must come
    back ≈ 0 within the documented estimator accuracy (~0.5 kcal at this
    protocol length; the residual is the WT transient from over-filling
    the starting basin, measured −0.52 kcal at 40k steps in round 3)."""
    from constant_ph_tpu import titration

    sys_ = solvated_acid(
        n_side=3, rigid_water=True, lambda_coupled=False,
        cutoff=4.5, skin=1.5, coul_style="dsf", alpha=0.2, seed=13, pH=4.75,
    )
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0, gamma=0.01,
                      lambda_thermostat="langevin", lambda_gamma=0.05,
                      rebuild_every=10)
    dg = titration.calibrate_dG_ref_metad(
        ts, tst, cfg, n_steps=40_000, chunk=500)
    assert dg.shape == (ts.spec.n_sites,)
    assert np.all(np.abs(dg) < 0.8), dg


def test_deposit_many_equals_sequential_deposits():
    """The multiple-walkers merge (deposit_many) must be EXACTLY the
    sequential application of deposit() — same progressive WT heights."""
    mp = metad.MetadParams(nbins=121, sigma=0.04, h0=0.4, gamma=6.0)
    key = jax.random.PRNGKey(3)
    lam_seq = jax.random.uniform(key, (12, 2), minval=0.0, maxval=1.0)
    V1, dV1 = metad.init_tables(2, mp)
    for k in range(12):
        V1, dV1 = metad.deposit(V1, dV1, lam_seq[k], mp)
    V2, dV2 = metad.deposit_many(*metad.init_tables(2, mp), lam_seq, mp)
    # f32 accumulation-order noise between scan and eager: ~1e-5 relative
    np.testing.assert_allclose(np.asarray(V2), np.asarray(V1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(dV2), np.asarray(dV1), rtol=1e-4,
                               atol=1e-5)


@pytest.mark.acceptance
def test_shared_walkers_estimator_matches_hh():
    """Multiple-walkers with a SHARED (chunk-frozen, delayed) bias must
    converge the same HH observable as in-run deposits: 4 walkers at
    dpH=0 pooling hills into one table, chunked λ-only sampling."""
    pK, dpH = 4.0, 0.0
    mp = metad.MetadParams(nbins=241, sigma=0.02, h0=0.25, gamma=15.0,
                           stride=100)
    T, dt, gamma_l = 300.0, 0.5, 0.05
    p = BiasParams()
    spec = lambda_dyn.make_single_site([0], [0.0], [0.0], pK=pK)
    m = spec.m_lambda
    inv_m = units.FTM2V / m
    c1 = jnp.exp(-gamma_l * dt)
    c2 = jnp.sqrt((1.0 - c1 * c1) * units.BOLTZ * T / (m * units.MVV2E))
    pH = jnp.array(pK + dpH)
    W = 4

    @jax.jit
    def chunk(lam, v, keys, V, dV):
        # one frozen-bias chunk per walker (vmapped), returns λ trace
        def one(lam_w, v_w, keys_w):
            def step(carry, k):
                lam_, v_ = carry
                def force(l):
                    F, _ = lambda_dyn.lambda_force(
                        l, jnp.zeros(1), spec, pH, T, p)
                    _, dvb = metad.lookup(V, dV, l, mp)
                    return F - dvb
                F = force(lam_)
                v_ = v_ + 0.5 * dt * F * inv_m
                lam_ = lam_ + 0.5 * dt * v_
                v_ = c1 * v_ + c2 * jax.random.normal(k, v_.shape)
                lam_ = lam_ + 0.5 * dt * v_
                v_ = v_ + 0.5 * dt * force(lam_) * inv_m
                return (lam_, v_), lam_[0]
            (lam_w, v_w), tr = jax.lax.scan(step, (lam_w, v_w), keys_w)
            return lam_w, v_w, tr
        return jax.vmap(one)(lam, v, keys)

    # chunk short enough that each walker adds only ~2 hills per
    # merge — long frozen-bias chunks dump correlated hill bursts
    # and overshoot (measured: 2000-step chunks gave est 0.65 for
    # want 0.5; 200-step chunks converge)
    steps_per_chunk, n_chunks = 200, 400
    V, dV = metad.init_tables(1, mp)
    lam = jnp.zeros((W, 1))
    v = jnp.zeros((W, 1))
    key = jax.random.PRNGKey(9)
    fracs = []
    for c in range(n_chunks):
        key, k1 = jax.random.split(key)
        keys = jax.random.split(k1, W * steps_per_chunk).reshape(
            W, steps_per_chunk, 2)
        lam, v, tr = chunk(lam, v, keys, V, dV)
        # merge hills: sub-sample at the stride, interleave walkers
        seq = tr[:, mp.stride - 1::mp.stride]            # (W, K)
        seq = seq.T.reshape(-1, 1)                       # time-major
        V, dV = metad.deposit_many(V, dV, seq, mp)
        if c >= n_chunks // 2:
            fracs.append(float(metad.deprotonated_fraction(V, mp)[0]))
    est = float(np.mean(fracs))
    want = 1.0 / (1.0 + 10.0 ** (-dpH))
    assert abs(est - want) < 0.08, (est, want)


def test_mesh_walker_merge_matches_serial_frozen_merge():
    """Cross-device multiple-walkers merge (shard_map + psum over the
    8-device CPU mesh) must equal the serial frozen-base merge — the
    delayed-bias deltas are order-free, so the distributed and local
    results agree to float tolerance; and for small per-walker bursts it
    must track the progressive deposit_many within the documented
    delayed-bias lag (DESIGN.md §8 rule c)."""
    from jax.sharding import Mesh

    S, W, K = 3, 8, 2
    p = metad.MetadParams(nbins=121, sigma=0.05, h0=0.3, gamma=12.0,
                          stride=10)
    rng = np.random.default_rng(7)
    # pre-fill the shared table a bit so WT heights are non-trivial
    V, dV = metad.init_tables(S, p)
    warm = jnp.asarray(rng.uniform(0.1, 0.9, (20, S)).astype(np.float32))
    V, dV = metad.deposit_many(V, dV, warm, p)
    seq = jnp.asarray(rng.uniform(0.0, 1.0, (W, K, S)).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:8]), ("walkers",))
    merge = metad.make_mesh_walker_merge(mesh, "walkers", p)
    Vm, dVm = jax.jit(merge)(V, dV, seq)

    # serial frozen-base reference
    dVt, ddVt = metad.deposit_frozen(V, dV, seq.reshape(-1, S), p)
    np.testing.assert_allclose(np.asarray(Vm), np.asarray(V + dVt),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dVm), np.asarray(dV + ddVt),
                               rtol=1e-4, atol=1e-4)

    # progressive merge stays within the delayed-bias lag for small K
    Vp, dVp = metad.deposit_many(V, dV, seq.reshape(-1, S), p)
    lag = float(jnp.max(jnp.abs(Vp - Vm)))
    # frozen heights are upper bounds; with 16 hills of h≤0.3 the lag is
    # bounded by a fraction of one hill height
    assert lag < 0.5 * p.h0 * W * K * 0.1 + 0.05, lag


def test_mesh_group_merge_matches_serial_frozen_merge():
    """The one-collective G-group batched mesh merge (the campaign
    driver's --mesh-walkers path) must equal the per-group serial
    frozen-base merge: group tables are independent, walker deltas are
    order-free, psum only sums the walker axis."""
    from jax.sharding import Mesh

    G, S, W, K = 3, 2, 4, 2
    p = metad.MetadParams(nbins=81, sigma=0.05, h0=0.3, gamma=12.0,
                          stride=10)
    rng = np.random.default_rng(11)
    Vs, dVs = [], []
    for g in range(G):
        V, dV = metad.init_tables(S, p)
        warm = jnp.asarray(
            rng.uniform(0.1, 0.9, (10 + 5 * g, S)).astype(np.float32))
        V, dV = metad.deposit_many(V, dV, warm, p)
        Vs.append(V)
        dVs.append(dV)
    Vg = jnp.stack(Vs)
    dVg = jnp.stack(dVs)
    seq = jnp.asarray(rng.uniform(0.0, 1.0, (G, W, K, S)).astype(np.float32))

    mesh = Mesh(np.array(jax.devices()[:4]), ("walk",))
    merge = metad.make_mesh_group_merge(mesh, "walk", p)
    Vm, dVm = jax.jit(merge)(Vg, dVg, seq)

    for g in range(G):
        dVt, ddVt = metad.deposit_frozen(Vs[g], dVs[g],
                                         seq[g].reshape(-1, S), p)
        np.testing.assert_allclose(np.asarray(Vm[g]),
                                   np.asarray(Vs[g] + dVt),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dVm[g]),
                                   np.asarray(dVs[g] + ddVt),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.acceptance
def test_calibrate_metad_refuses_silent_inf():
    """A metad calibration that never crosses the λ barrier must raise,
    not return -inf (round-4 finding: the old soft default protocol
    silently returned -inf on 13/20 HEWL sites,
    results/dg_crosscheck_metad_v5e.json). A deliberately crippled
    protocol (h0≈0 deposits nothing, so the walker stays in its start
    basin) guarantees the unvisited-basin condition in CI time."""
    from constant_ph_tpu import titration

    sys_ = solvated_acid(
        n_side=3, rigid_water=True, lambda_coupled=True,
        cutoff=4.5, skin=1.5, coul_style="dsf", alpha=0.2, seed=7, pH=5.0,
    )
    ts = split_system(sys_, skin=1.5)
    tst = to_tiled(ts, sys_.state)
    # start the walker DEEP in the deprotonated basin (a fresh build
    # starts near the barrier top and its first hills spill into both
    # basins, masking the never-crossed signature)
    tst = tst.replace(lam=jnp.full_like(tst.lam, 0.98))
    cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0, gamma=0.01,
                       lambda_thermostat="langevin", lambda_gamma=0.05,
                       rebuild_every=10)
    # gamma=2 saturates the WT fill near (γ-1)kT ≈ 0.6 kcal — far below
    # the ~6.5 kcal Donnini barrier, so hills pile up in the start basin
    # and the other basin stays empty
    crippled = metad.MetadParams(nbins=121, sigma=0.02, h0=0.5,
                                 gamma=2.0, stride=25)
    with pytest.raises(RuntimeError, match="never crossed"):
        titration.calibrate_dG_ref_metad(
            ts, tst, cfg, metad_params=crippled, n_steps=1500, chunk=250)


def test_pooled_profile_exact_on_noise_free_tables():
    """Rao–Blackwell identity: when every pH walker's table is exactly
    (1−1/γ)·(F0 + driving), pooled_intrinsic_profile recovers F0 up to
    a constant, fraction_at_ph reproduces deprotonated_fraction of each
    original landscape, and pooled_delta_f returns F0's basin ΔF."""
    p = metad.MetadParams(nbins=161, gamma=20.0)
    grid = p.grid()
    slope = 50.0
    f_lam = jax.nn.sigmoid(slope * (grid - 0.5))
    kT = units.BOLTZ * p.T
    pK = jnp.asarray([4.25, 6.5])
    pH = jnp.asarray([3.5, 5.0, 6.5])
    # synthetic intrinsic double well, different asymmetry per site
    F0 = jnp.stack([6.0 * (grid - 0.2) ** 2 * (grid - 0.9) ** 2 * 10.0
                    + off * f_lam for off in (0.0, 1.3)])
    F0 = F0 - F0.min(axis=1, keepdims=True)
    drive = kT * jnp.log(10.0) * (pK[None, :] - pH[:, None])
    Ftot = F0[None] + drive[:, :, None] * f_lam[None, None, :]
    V = -(1.0 - 1.0 / p.gamma) * Ftot                    # (G, S, B)

    F0_hat = metad.pooled_intrinsic_profile(V, pK, pH, p, slope)
    d = np.array(F0_hat - F0)
    d -= d.min(axis=1, keepdims=True)                    # constant offset
    assert np.abs(d).max() < 1e-3

    for g in range(3):
        want = metad.deprotonated_fraction(V[g], p)
        got = metad.fraction_at_ph(F0_hat, pK, float(pH[g]), p, slope)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)

    df0 = np.asarray(metad.pooled_delta_f(F0_hat, p))
    lzd, lzp = metad._basin_logZ_F(F0, p)
    want_df = -kT * np.asarray(lzd - lzp)
    np.testing.assert_allclose(df0, want_df, atol=2e-3)


def test_pooled_profile_averages_down_noise():
    """Independent per-walker table noise must shrink ~√G in the pooled
    basin ΔF: pooling 16 noisy walkers lands an order of magnitude
    closer to truth than the mean per-walker estimate error."""
    p = metad.MetadParams(nbins=161, gamma=20.0)
    grid = p.grid()
    slope = 50.0
    f_lam = jax.nn.sigmoid(slope * (grid - 0.5))
    kT = units.BOLTZ * p.T
    pK = jnp.asarray([4.25])
    G = 16
    pH = jnp.linspace(3.0, 6.0, G)
    F0 = (6.0 * (grid - 0.2) ** 2 * (grid - 0.9) ** 2 * 10.0)[None, :]
    drive = kT * jnp.log(10.0) * (pK[None, :] - pH[:, None])
    Ftot = F0[None] + drive[:, :, None] * f_lam[None, None, :]
    key = jax.random.PRNGKey(7)
    # smooth correlated noise (hill-shaped), ±~0.8 kcal — the measured
    # per-walker V-table error scale at campaign strength
    centers = jax.random.uniform(key, (G, 1, 24), minval=0.0, maxval=1.0)
    amps = 0.4 * jax.random.normal(jax.random.fold_in(key, 1), (G, 1, 24))
    bumps = jnp.sum(
        amps[..., None] * jnp.exp(-(grid[None, None, None, :]
                                    - centers[..., None]) ** 2
                                  / (2 * 0.08 ** 2)), axis=2)
    V = -(1.0 - 1.0 / p.gamma) * (Ftot + bumps)

    lzd, lzp = metad._basin_logZ_F(jnp.asarray(F0), p)
    truth = float(-kT * (lzd - lzp)[0])
    per_walker = np.asarray(
        [metad.delta_f_sites(V[g], p)[0]
         - float(drive[g, 0]) for g in range(G)])
    pooled = float(metad.pooled_delta_f(
        metad.pooled_intrinsic_profile(V, pK, pH, p, slope), p)[0])
    err_single = np.abs(per_walker - truth).mean()
    err_pooled = abs(pooled - truth)
    assert err_pooled < err_single / 2.5, (err_pooled, err_single)


def test_retilt_profile_matches_rerun():
    """ΔG_ref is a linear tilt: pooling tables simulated at D0 and
    retilting to D1 must reproduce (exactly, up to a constant) the
    profile that a run AT D1 would have converged to, and fraction_at_ph
    on the retilted profile equals the D1 landscape's basin fractions."""
    p = metad.MetadParams(nbins=161, gamma=20.0)
    grid = p.grid()
    slope = 50.0
    f_lam = jax.nn.sigmoid(slope * (grid - 0.5))
    kT = units.BOLTZ * p.T
    pK = jnp.asarray([4.25, 6.5])
    pH = jnp.asarray([3.5, 5.0, 6.5])
    D0, D1 = -39.37, -38.62
    Fphys = jnp.stack([6.0 * (grid - 0.2) ** 2 * (grid - 0.9) ** 2 * 10.0
                       + off * f_lam for off in (0.3, -0.4)])

    def tables(D):
        drive = (kT * jnp.log(10.0) * (pK[None, :] - pH[:, None]) - D)
        Ftot = Fphys[None] + drive[:, :, None] * f_lam[None, None, :]
        return -(1.0 - 1.0 / p.gamma) * Ftot

    F0_at_D0 = metad.pooled_intrinsic_profile(tables(D0), pK, pH, p, slope)
    F0_re = metad.retilt_profile(F0_at_D0, D0, D1, p, slope)
    F0_at_D1 = metad.pooled_intrinsic_profile(tables(D1), pK, pH, p, slope)
    d = np.array(F0_re - F0_at_D1)
    d -= d.min(axis=1, keepdims=True)
    assert np.abs(d).max() < 1e-4
    for g in range(3):
        want = metad.deprotonated_fraction(tables(D1)[g], p)
        got = metad.fraction_at_ph(F0_re, pK, float(pH[g]), p, slope)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4)
    # per-site retilt: site 0 to D1, site 1 stays — only site 0 moves
    F0_mix = metad.retilt_profile(F0_at_D0, D0, jnp.asarray([D1, D0]),
                                  p, slope)
    np.testing.assert_allclose(np.asarray(F0_mix[1]),
                               np.asarray(F0_at_D0[1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(F0_mix[0]),
                               np.asarray(F0_re[0]), atol=1e-6)
