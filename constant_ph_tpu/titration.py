"""ΔG_ref calibration + titration analysis utilities.

In constant-pH MD the force-field deprotonation free energy of each site
must be referenced against the model compound whose experimental pKa is
used (the Donnini–Ullmann scheme the reference implements): the site
Hamiltonian term is f(λ)·[kT·ln10·(pK−pH) − ΔG_ref] (lambda_dyn.ph_energy),
where ΔG_ref = G_ff(λ=1) − G_ff(λ=0) of the reference compound in solution.
Without it the raw force field dominates (solvation of the ionized form is
tens of kcal/mol) and titration curves saturate.

ΔG_ref comes from thermodynamic integration over frozen-λ windows:

    ΔG_ref = ∫₀¹ ⟨dU_elec/dλ⟩_λ dλ

sampled with the same engine (lambda_frozen=True) and Gauss–Legendre
quadrature. The reference never solved this (its HB−HA scheme is the
uncalibrated approximation, SURVEY.md §8 bug 16).
"""
from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


# 7-point Gauss–Legendre nodes/weights on [0, 1]
_GL_X = np.array([0.02544604, 0.12923441, 0.29707742, 0.5,
                  0.70292258, 0.87076559, 0.97455396])
_GL_W = np.array([0.06474248, 0.13985270, 0.19091503, 0.20897959,
                  0.19091503, 0.13985270, 0.06474248])


def calibrate_dG_ref_tiled(
    tsys,
    tstate,
    cfg,
    *,
    bias=None,
    kspace_ep=None,
    site: int = 0,
    equil_steps: int = 500,
    sample_steps: int = 2000,
    call_steps: int | None = None,
    nodes=None,
    weights=None,
    return_profile: bool = False,
):
    """TI calibration on the tiled engine. Returns ΔG_ref (and the λ-profile
    of ⟨dU/dλ⟩ if requested). The input tstate should be pre-equilibrated.

    call_steps: split equilibration/sampling into jit calls of at most
    this many steps (physics-identical; per-call ⟨dU/dλ⟩ means average
    with equal weights since the calls are equal-length). The axon TPU
    worker kills device programs running ~100 s in one XLA call (measured
    round 3/4: a 16000-step HEWL call at ~6 ms/step dies, 8000-step calls
    pass) — long protocols MUST chunk.
    """
    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.tiled.engine import TiledEngine

    if bias is None:
        bias = BiasParams()
    nodes = _GL_X if nodes is None else np.asarray(nodes)
    weights = _GL_W if weights is None else np.asarray(weights)

    cfg_frozen = dataclasses.replace(cfg, lambda_frozen=True)
    eng = TiledEngine(tsys, cfg_frozen, bias=bias, kspace_ep=kspace_ep)
    if call_steps is None:
        call_steps = max(equil_steps, sample_steps, 1)
    eq_chunk = max(1, min(equil_steps, call_steps))
    n_eq = -(-equil_steps // eq_chunk) if equil_steps else 0
    samp_chunk = max(1, min(sample_steps, call_steps))
    n_samp = -(-sample_steps // samp_chunk)
    run_eq = jax.jit(eng.make_run(eq_chunk))
    run_samp = jax.jit(eng.make_run(samp_chunk))

    means = []
    for lam_val in nodes:
        lam = jnp.full_like(tstate.lam, 0.0).at[site].set(float(lam_val))
        st = tstate.replace(lam=lam, v_lam=jnp.zeros_like(tstate.v_lam))
        for _ in range(n_eq):
            st, _, _ = run_eq(st)
        acc = 0.0
        for _ in range(n_samp):
            st, _, obs = run_samp(st)
            acc += float(jnp.mean(obs.dUdlam[:, site]))
        means.append(acc / n_samp)
    dG = float(np.dot(weights, np.asarray(means)))
    if return_profile:
        return dG, (np.asarray(nodes), np.asarray(means))
    return dG


def calibrate_dG_ref(
    system,
    cfg,
    *,
    bias=None,
    site: int = 0,
    kspace_fn=None,
    equil_steps: int = 500,
    sample_steps: int = 2000,
    minimize_steps: int = 300,
    nodes=None,
    weights=None,
):
    """TI calibration on the canonical engine (reference path)."""
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.minimize import fire_minimize

    if bias is None:
        bias = BiasParams()
    nodes = _GL_X if nodes is None else np.asarray(nodes)
    weights = _GL_W if weights is None else np.asarray(weights)

    cfg_frozen = dataclasses.replace(cfg, lambda_frozen=True)
    eng = system.make_engine(cfg_frozen, bias=bias, kspace_fn=kspace_fn)
    state0 = system.state
    if minimize_steps:
        state0, _ = fire_minimize(eng, state0, n_steps=minimize_steps)

    run_eq = jax.jit(eng.make_run(equil_steps))
    run_samp = jax.jit(eng.make_run(sample_steps))
    nbr = eng.build_neighbors(state0.x, state0.box)

    means = []
    for lam_val in nodes:
        lam = jnp.zeros_like(state0.lam).at[site].set(float(lam_val))
        st = state0.replace(lam=lam, v_lam=jnp.zeros_like(state0.v_lam))
        st, _, _ = run_eq(st, nbr)
        st, _, obs = run_samp(st, nbr)
        means.append(float(jnp.mean(obs.dUdlam[:, site])))
    return float(np.dot(weights, np.asarray(means)))


def apply_dG_ref(spec, dG_ref):
    """Return a LambdaSpec with per-site ΔG_ref installed (scalar
    broadcasts; a length-S array sets sites individually)."""
    val = jnp.broadcast_to(
        jnp.asarray(dG_ref, dtype=spec.dG_ref.dtype), spec.dG_ref.shape)
    return spec.replace(dG_ref=val)


def parse_class_offsets(text):
    """Parse a per-pK-class ΔG_ref offset spec "pK:off[,pK:off...]"
    (e.g. "4.25:-0.89,6.5:0.12") into {pK: offset_kcal}. Empty/None
    parses to {}."""
    out = {}
    for item in (text or "").split(","):
        item = item.strip()
        if not item:
            continue
        k, _, v = item.partition(":")
        out[float(k)] = float(v)
    return out


def apply_dG_ref_per_class(spec, dG_base, class_offsets, tol=1e-3):
    """Install per-SITE ΔG_ref = dG_base + offset(pK class of the site).

    The residual analysis (examples/metad_vtable_residual.py) reports
    per-pK-class medians of the V-table free-energy residual; when a
    class offset is statistically stable across checkpoints it belongs
    in ΔG_ref, not in more sampling. `class_offsets` maps a pK value
    (matched to spec.pK within `tol`) to the kcal/mol offset. Unmatched
    offset keys raise (a silent typo would install the base constant).
    Mirrors the per-site pK argument of the reference fix
    (fix_constant_pH.cpp:47) at the calibration level."""
    pks = np.asarray(spec.pK)
    dg = np.full(pks.shape, float(dG_base))
    for pk, off in (class_offsets or {}).items():
        m = np.abs(pks - float(pk)) <= tol
        if not m.any():
            raise ValueError(
                f"dG_ref class offset for pK={pk}: no site has that pK "
                f"(spec classes: {sorted(set(np.round(pks, 4).tolist()))})")
        dg[m] += float(off)
    return apply_dG_ref(spec, dg)


def calibrate_dG_ref_metad(
    tsys,
    tstate,
    cfg,
    *,
    bias=None,
    kspace_ep=None,
    metad_params=None,
    n_steps: int = 60_000,
    chunk: int | None = None,
    tail_frac: float = 0.5,
    on_stuck: str = "raise",
):
    """PER-SITE ΔG_ref from ONE well-tempered λ-metadynamics run.

    TI (calibrate_dG_ref_tiled) integrates ⟨dU/dλ⟩ over frozen-λ windows
    of a single site and the result is shared across sites. Metadynamics
    measures every site's basin free-energy difference ΔF_s in the same
    run: at the state's pH, Henderson–Hasselbalch requires
    ΔF_s = kT·ln10·(pK_s − pH), so the calibrated correction is

        ΔG_ref_s ← ΔG_ref_s(current) + (ΔF_s(measured) − ΔF_s(wanted))

    (measured with the CURRENT spec.dG_ref installed — the update is a
    fixed-point correction and can be iterated). Returns the (S,) array
    of calibrated ΔG_ref values; install with apply_dG_ref.

    The estimator is the tail-time-average of metad.delta_f_sites over
    the last `tail_frac` of the run (single-snapshot estimates fluctuate
    with the most recent hill flux — see tests/test_metad.py).

    Accuracy: ~0.3-0.5 kcal/mol (≈0.3 pH units) at the default protocol
    length (measured on the uncoupled-site fixed point, where the exact
    answer is 0) — the residual is the well-tempered transient from
    over-filling the starting basin and decays with run length. Use TI
    (calibrate_dG_ref_tiled) when sub-0.1-kcal absolute calibration of a
    single reference site is needed; use this to measure per-site
    SPREADS around it in one run, or iterate the fixed point."""
    from constant_ph_tpu import metad as metad_mod
    from constant_ph_tpu import units
    from constant_ph_tpu.lambda_dyn import BiasParams
    from constant_ph_tpu.tiled.engine import TiledEngine

    if bias is None:
        bias = BiasParams()
    # Default protocol is CAMPAIGN strength. The old soft default
    # (σ=0.02, h0=0.25, γ=15) cannot cross the full-Δq landscape's
    # 9.5-25 kcal Marcus barrier — measured round 4: 13/20 sites
    # returned ΔF=−inf after 240 ps (results/dg_crosscheck_metad_v5e
    # .json). γ must satisfy γ ≳ 1 + F_barrier/kT (metad.py); on a
    # bare Donnini landscape γ=30 merely fills a bit longer — WT
    # convergence is unaffected.
    mp = metad_params or metad_mod.MetadParams(
        nbins=241, sigma=0.05, h0=0.4, gamma=30.0,
        stride=max(1, int(round(50.0 / cfg.dt))))
    S = tsys.spec.n_sites
    V0, dV0 = metad_mod.init_tables(S, mp)
    st = tstate.replace(metad_v=V0, metad_dv=dV0,
                        v_lam=jnp.zeros_like(tstate.v_lam))
    eng = TiledEngine(tsys, cfg, bias=bias, kspace_ep=kspace_ep, metad=mp)
    if chunk is None:
        chunk = 50 * cfg.rebuild_every
    run = jax.jit(eng.make_run(chunk))
    n_chunks = max(1, n_steps // chunk)
    dfs = []
    for _ in range(n_chunks):
        st, _, _ = run(st)
        dfs.append(np.asarray(metad_mod.delta_f_sites(st.metad_v, mp)))
    tail = max(1, int(round(tail_frac * len(dfs))))
    df_meas = np.mean(np.stack(dfs[-tail:]), axis=0)              # (S,)
    # crossing guard: a V table whose hills all landed in ONE basin
    # means the walker never crossed — the basin ΔF would then just
    # read back the (garbage) fill height. Round-4 measured exactly
    # this failure on 13/20 HEWL sites at a too-soft protocol
    # (results/dg_crosscheck_metad_v5e.json); refuse loudly instead.
    V_fin = np.asarray(st.metad_v)                          # (S, nbins)
    grid = np.asarray(mp.grid())
    # test the WELL windows (λ<0.25 / λ>0.75), not the half-lines: a
    # pre-bias thermal excursion can drop one hill in the barrier
    # region of the far basin, but only a genuine crossing reaches the
    # far well bottom (the wells sit at λ≈0 and λ≈1)
    fill_prot = V_fin[:, grid < 0.25].max(axis=1)
    fill_dep = V_fin[:, grid > 0.75].max(axis=1)
    never = ((np.minimum(fill_dep, fill_prot) < 0.5 * mp.h0)
             & (np.maximum(fill_dep, fill_prot) > 2.0 * mp.h0))
    if never.any() or not np.isfinite(df_meas).all():
        bad = sorted(set(np.where(never)[0].tolist())
                     | set(np.where(~np.isfinite(df_meas))[0].tolist()))
        if on_stuck == "nan":
            # survey mode (e.g. the cross-check driver): report the
            # stuck sites as NaN and keep the finite ones
            df_meas = df_meas.copy()
            df_meas[bad] = np.nan
            kT = units.BOLTZ * cfg.T
            pH = float(np.asarray(tstate.pH))
            df_want = kT * units.LN10 * (np.asarray(tsys.spec.pK) - pH)
            return np.asarray(tsys.spec.dG_ref) + (df_meas - df_want)
        raise RuntimeError(
            f"metad calibration never crossed the λ barrier on sites "
            f"{bad} after {n_steps} steps (hills deposited in one "
            f"basin only): the basin free-energy difference would "
            f"read back the fill height, not physics. The well-"
            f"tempered fill saturates near (γ−1)·kT, so γ must "
            f"satisfy γ ≳ 1 + F_barrier/kT (got γ={mp.gamma}); "
            f"full-Δq landscapes with few buffer waters carry a "
            f"9.5-25 kcal Marcus barrier and need γ ~ 25-40, "
            f"σ ~ 0.05, h0 ~ 0.4 (measured: metad.py, BASELINE.md "
            f"rounds 3-4). Raise gamma / run longer (n_steps) or "
            f"spread the compensating charge over more buffer "
            f"waters.")
    kT = units.BOLTZ * cfg.T
    pH = float(np.asarray(tstate.pH))
    df_want = kT * units.LN10 * (np.asarray(tsys.spec.pK) - pH)
    return np.asarray(tsys.spec.dG_ref) + (df_meas - df_want)
