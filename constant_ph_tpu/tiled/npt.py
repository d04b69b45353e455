"""NPT via a Monte-Carlo barostat on the tiled engine (ROADMAP item 4).

Isotropic MC volume moves between jitted MD chunks — the standard hybrid
MD/MC-barostat scheme (GROMACS `pcoupl = C-rescale`-era MC barostat;
LAMMPS has no MC barostat, but the reference's host world runs constant-pH
production at NpT, so the capability belongs to the framework even though
the reference fix itself is ensemble-agnostic).

Scheme (rigid molecules ⇒ molecular scaling):
  - propose V' = V·e^{δ}, δ ~ U(−Δ, Δ)  (ln-V random walk);
  - scale MOLECULE centers of mass by s = (V'/V)^{1/3}: rigid-water
    geometry is preserved exactly (no SHAKE shock), buffer waters in the
    solute set scale as their own molecules, the remaining solute scales
    as one molecule;
  - accept with  min(1, exp(−β[ΔU + P·ΔV] + (N_mol + 1)·ln(V'/V)))
    — the +1 is the ln-V proposal Jacobian; N_mol counts rigid bodies
    (molecular scaling ⇒ molecular, not atomic, ideal-gas term);
  - U is the full tiled potential at the scaled configuration (pair +
    bonded + λ-site terms; dense cell tiles stay valid because atoms move
    ≤ (s−1)·cell ≈ 0.01 Å relative to their — equally scaled — cells).

k-space composes via PME + cfg.kspace_live_box=True: the influence
function, mesh spacing, and volume are derived from the state box on
device each evaluation (ops/pme.pme_influence), so scaled-configuration
energies are exact under volume moves. Baked-box reciprocal params
(factorized Ewald, or PME without the flag) are refused — they would
silently evaluate with a stale influence function.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu import units
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import TiledState


def _solute_groups(ts):
    """(Ns, n_groups) one-hot molecule matrix for the solute set: group 0
    is the (single-molecule) solute; each rigid buffer-water triple is its
    own group. Padding slots get weight 0 via smask at use time."""
    Ns = int(ts.solute.q0.shape[0])
    gid = np.zeros(Ns, dtype=np.int64)
    n_g = 1
    if ts.solute_constraints is not None:
        trips = np.asarray(ts.solute_constraints.triplets)
        for m, t in enumerate(trips):
            gid[t] = m + 1
        n_g = 1 + trips.shape[0]
    onehot = np.zeros((Ns, n_g), dtype=np.float32)
    onehot[np.arange(Ns), gid] = 1.0
    return onehot, n_g


def _check_npt_kspace(eng: TiledEngine) -> None:
    """Volume moves require box-consistent reciprocal energies: PME with
    cfg.kspace_live_box derives Âhat/spacing/volume from the state box on
    device (ops/pme.pme_influence), so U(s·x, s·box) is exact. Baked-box
    k-space params would silently evaluate the scaled configuration with a
    stale influence function — refuse."""
    if eng.kspace_ep is None:
        return
    if not eng.cfg.kspace_live_box:
        raise NotImplementedError(
            "NPT with k-space needs cfg.kspace_live_box=True (PME params "
            "re-derive the influence function from the live box); baked-box "
            "reciprocal params would be evaluated stale after volume moves")


def make_mc_barostat(eng: TiledEngine, *, pressure_atm: float,
                     T: float, max_dlnV: float = 2e-3):
    """Build a jittable MC volume move: (tst, key) -> (tst', accepted).

    `max_dlnV` is the half-width of the ln-V proposal; tune for ~40-60%
    acceptance (2e-3 ≈ ±0.07% in box length for liquid water boxes).
    """
    _check_npt_kspace(eng)
    ts = eng.ts
    wm = ts.water
    W = ts.params.W
    mass_pat = jnp.asarray(np.asarray(wm.mass_pattern, np.float32))
    m_tot_w = float(np.sum(wm.mass_pattern))
    onehot_np, n_g = _solute_groups(ts)
    onehot = jnp.asarray(onehot_np)
    # group COM weights: mass * smask (padding excluded); the group mass
    # is static (masses and membership are static)
    m_s = np.asarray(ts.solute.mass) * np.asarray(ts.solute.smask)
    m_g = onehot_np.T @ m_s                              # (n_g,)
    m_g = np.maximum(m_g, 1e-30)
    w_com = jnp.asarray((m_s[:, None] * onehot_np) / m_g[None, :])
    # molecule count for the ideal-gas ln V term: valid waters + solute
    # molecule + buffer-water molecules (padding contributes none)
    n_mol_solute = 1 if int(np.sum(np.asarray(ts.solute.smask))) else 0
    n_mol_static = n_g - 1 + n_mol_solute
    kT = units.BOLTZ * T
    p_kcal = pressure_atm * units.ATM_A3_TO_KCAL    # kcal/mol per Å³

    def move(tst: TiledState, key):
        k_prop, k_acc = jax.random.split(key)
        v0 = tst.box[0] * tst.box[1] * tst.box[2]
        dln = max_dlnV * (2.0 * jax.random.uniform(k_prop) - 1.0)
        s = jnp.exp(dln / 3.0)

        # water molecular COM scaling (exact geometry preservation)
        G = tst.wx.shape[1]
        wx_m = tst.wx.reshape(3, G, W, 3)
        com = jnp.einsum("dgwa,a->dgw", wx_m, mass_pat) / m_tot_w
        wx_new = (wx_m + (s - 1.0) * com[..., None]).reshape(tst.wx.shape)

        # solute group-COM scaling
        com_g = jnp.einsum("ia,id->ad", w_com, tst.sx)      # (n_g, 3)
        sx_new = tst.sx + (s - 1.0) * (onehot @ com_g)

        tst_new = tst.replace(wx=wx_new, sx=sx_new, box=tst.box * s)
        u0 = eng.compute_forces(tst).e_pot
        u1 = eng.compute_forces(tst_new).e_pot
        n_mol = jnp.sum(tst.wvalid) + float(n_mol_static)
        dH = ((u1 - u0) + p_kcal * v0 * (jnp.exp(dln) - 1.0)
              - (n_mol + 1.0) * kT * dln)
        accept = jax.random.uniform(k_acc) < jnp.exp(
            jnp.minimum(-dH / kT, 0.0))
        out = jax.tree.map(lambda a, b: jnp.where(accept, b, a),
                           tst, tst_new)
        return out, accept

    return move


def make_pressure_fn(eng: TiledEngine, *, T: float, dlnV: float = 2e-4):
    """Jittable instantaneous MOLECULAR pressure (atm): P = N_mol·kT/V −
    ∂U/∂V at fixed molecular fractional coordinates, with ∂U/∂V by
    central difference of the same COM-scaled energy the MC barostat
    uses (rigid bodies ⇒ molecular virial; intramolecular constraint
    forces do no P·V work). Costs two extra force evaluations — a
    diagnostic, not a hot-path term."""
    _check_npt_kspace(eng)
    ts = eng.ts
    wm = ts.water
    W = ts.params.W
    mass_pat = jnp.asarray(np.asarray(wm.mass_pattern, np.float32))
    m_tot_w = float(np.sum(wm.mass_pattern))
    onehot_np, n_g = _solute_groups(ts)
    onehot = jnp.asarray(onehot_np)
    m_s = np.asarray(ts.solute.mass) * np.asarray(ts.solute.smask)
    m_g = np.maximum(onehot_np.T @ m_s, 1e-30)
    w_com = jnp.asarray((m_s[:, None] * onehot_np) / m_g[None, :])
    n_mol_solute = 1 if int(np.sum(np.asarray(ts.solute.smask))) else 0
    n_mol_static = n_g - 1 + n_mol_solute
    kT = units.BOLTZ * T

    def scaled_energy(tst: TiledState, s):
        G = tst.wx.shape[1]
        wx_m = tst.wx.reshape(3, G, W, 3)
        com = jnp.einsum("dgwa,a->dgw", wx_m, mass_pat) / m_tot_w
        wx_new = (wx_m + (s - 1.0) * com[..., None]).reshape(tst.wx.shape)
        com_g = jnp.einsum("ia,id->ad", w_com, tst.sx)
        sx_new = tst.sx + (s - 1.0) * (onehot @ com_g)
        t2 = tst.replace(wx=wx_new, sx=sx_new, box=tst.box * s)
        return eng.compute_forces(t2).e_pot

    def pressure(tst: TiledState):
        v = tst.box[0] * tst.box[1] * tst.box[2]
        s_hi = jnp.exp(dlnV / 3.0)
        s_lo = jnp.exp(-dlnV / 3.0)
        dv = v * (jnp.exp(dlnV) - jnp.exp(-dlnV))   # V_hi - V_lo
        du_dv = (scaled_energy(tst, s_hi) - scaled_energy(tst, s_lo)) / dv
        n_mol = jnp.sum(tst.wvalid) + float(n_mol_static)
        p_kcal_a3 = n_mol * kT / v - du_dv          # kcal/mol per Å³
        return p_kcal_a3 / units.ATM_A3_TO_KCAL     # atm

    return pressure


def npt_elastic_run(ts, tst, cfg, n_steps: int, *, pressure_atm: float,
                    chunk: int = 2000, bias=None, kspace_ep=None,
                    margin_min: int = 6,
                    max_dlnV: float = 2e-3, seed: int = 0,
                    max_box_drift: float = 0.04,
                    on_chunk=None, device=None):
    """The elastic production loop (tiled/elastic.py) with one MC volume
    move per chunk boundary — jitted chunk + move functions are built
    once and rebuilt only on a capacity retile.

    Returns (ts, tst, obs, info, npt_stats) where npt_stats records the
    acceptance fraction and the volume trace. The cell grid is fixed at
    build time, so the cumulative box change is capped at `max_box_drift`
    (relative, per dimension) — beyond that the run stops with a clear
    error instead of silently degrading stencil coverage (re-split the
    system to continue; equilibrated liquids sit well inside ±4%)."""
    from constant_ph_tpu.tiled.elastic import ElasticInfo
    from constant_ph_tpu.tiled.layout import retile_auto

    cpu = jax.local_devices(backend="cpu")[0]
    if device is None:
        device = jax.devices()[0]
    chunk = -(-chunk // cfg.rebuild_every) * cfg.rebuild_every
    box0 = np.asarray(jax.device_get(tst.box), np.float64)
    key = jax.random.PRNGKey(seed)
    stats = {"proposed": 0, "accepted": 0, "volume": []}
    info = ElasticInfo()

    def build(ts_):
        kw = {"bias": bias} if bias is not None else {}
        if kspace_ep is not None:
            kw["kspace_ep"] = kspace_ep    # PME + cfg.kspace_live_box
        eng = TiledEngine(ts_, cfg, **kw)
        run = jax.jit(eng.make_run(chunk, detailed_flags=True))
        move = jax.jit(make_mc_barostat(
            eng, pressure_atm=pressure_atm, T=cfg.T, max_dlnV=max_dlnV))
        return eng, run, move

    eng, run, move = build(ts)
    n_waters = eng.n_waters
    obs_parts = []
    done = 0
    while done < n_steps:
        tst2, (ov_cap, ov_drift), obs = run(tst)
        if bool(ov_cap):
            occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
            with jax.default_device(cpu):
                ts, tst = retile_auto(
                    ts, jax.tree.map(jnp.asarray, jax.device_get(tst)),
                    max(occ, ts.params.W), margin_min=margin_min)
            tst = jax.device_put(tst, device)
            eng, run, move = build(ts)
            info.n_retiles += 1
            info.retile_steps.append(done)
            continue
        if bool(ov_drift):
            info.n_dangerous_blocks += 1
        tst = tst2
        done += chunk
        assert int(np.asarray(tst.wvalid).sum()) == n_waters, \
            "molecule count changed — capacity invariant violated"
        obs_parts.append(obs)
        if on_chunk is not None:
            on_chunk(done, ts, tst, obs)
        key, k_mv = jax.random.split(key)
        tst, acc = move(tst, k_mv)
        stats["proposed"] += 1
        stats["accepted"] += int(bool(acc))
        box = np.asarray(jax.device_get(tst.box), np.float64)
        stats["volume"].append(float(np.prod(box)))
        if np.any(np.abs(box / box0 - 1.0) > max_box_drift):
            raise RuntimeError(
                f"NPT box drifted beyond ±{max_box_drift:.0%} of the build "
                f"box ({box} vs {box0}); re-split the system at the new "
                "density to continue")
    info.final_W = ts.params.W
    obs_all = jax.tree.map(lambda *a: jnp.concatenate(a), *obs_parts)
    return ts, tst, obs_all, info, stats
