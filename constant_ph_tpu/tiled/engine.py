"""TiledEngine: the TPU hot-path engine (same physics as engine.Engine).

One jitted step over TiledState: roll-stencil pair blocks, factorized
Ewald, λ-dynamics with exact dU/dλ, BAOAB/VV/NHC integration, tile-regular
SHAKE water — zero scalar gathers per step except the (small) solute
bonded/constraint index lookups. Validated against engine.Engine (the
semantic reference) in tests/test_tiled.py.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import lambda_dyn, units
from constant_ph_tpu.engine import EngineConfig, Observables
from constant_ph_tpu.integrators import nhc_halfstep
from constant_ph_tpu.lambda_dyn import BiasParams
from constant_ph_tpu.ops.bonded import bonded_forces
from constant_ph_tpu.ops.ewald import EwaldParams, ewald_recip_xd
from constant_ph_tpu.ops.pme import PMEParams, pme_recip_tiled
from constant_ph_tpu.tiled import forces as tforces
from constant_ph_tpu.tiled.layout import (
    TiledState,
    TiledSystem,
    rebin,
)
from constant_ph_tpu.tiled.shake import TiledWaterShake


@struct.dataclass
class TiledForces:
    fw: jax.Array     # (3, G, 3W)
    fs: jax.Array     # (Ns, 3)
    f_lam: jax.Array
    e_lj: jax.Array
    e_coul: jax.Array
    e_bonded: jax.Array
    e_kspace: jax.Array
    e_site: jax.Array
    eatom_w: jax.Array  # (G, 3W)
    eatom_s: jax.Array  # (Ns,)
    phi_s: jax.Array
    dUdlam: jax.Array
    # reciprocal-space φ on solute atoms from the most recent k-space
    # evaluation — carried through the (state, forces) scan carry so λ
    # forces between MTS boundaries use the (slowly varying) stale value
    # rather than dropping the term (the mollified slow-force treatment;
    # exact when kspace_every == 1). Zeros when there is no k-space term.
    phi_recip_s: jax.Array

    @property
    def e_pot(self):
        return (self.e_lj + self.e_coul + self.e_bonded + self.e_kspace
                + self.e_site)


class TiledEngine:
    def __init__(
        self,
        tsys: TiledSystem,
        config: EngineConfig = EngineConfig(),
        bias: BiasParams = BiasParams(),
        kspace_ep: Optional[EwaldParams] = None,
        use_pallas_ww: bool = False,
        metad=None,
        metad_frozen: bool = False,
    ):
        self.ts = tsys
        self.cfg = config
        self.bias = bias
        self.kspace_ep = kspace_ep
        # metadynamics λ bias (constant_ph_tpu/metad.py): `metad` is a
        # MetadParams; states must carry matching (S, nbins) tables
        # (metad.init_tables → TiledState.metad_v/metad_dv). With
        # `metad_frozen` the bias acts as a static potential (production
        # re-sampling on a converged landscape); otherwise make_run
        # deposits hills at block boundaries (burn-in / F(λ) estimation).
        self.metad = metad
        self.metad_frozen = metad_frozen
        if metad is not None and tsys.spec is None:
            raise ValueError("metadynamics needs titratable sites")
        # use_pallas_ww: False = XLA hot path; True = the full-tally Pallas
        # oracle kernel; "fast" = the like-for-like Pallas hot-path kernel
        # (tiled/pallas_ww.water_water_pallas_fast)
        self.use_pallas_ww = (use_pallas_ww
                              if min(tsys.params.grid) >= 3 else False)
        self.shake = TiledWaterShake(tsys.water, tsys.params)
        p = tsys.params
        self.grid = p.grid
        self.W = p.W
        self.G = p.G
        wm = tsys.water
        self.wmass = jnp.asarray(
            np.tile(wm.mass_pattern, p.W), dtype=jnp.float32)   # (3W,)
        self.wq_pat = jnp.asarray(
            np.tile(wm.q_pattern, p.W), dtype=jnp.float32)
        self.n_waters = tsys.water_atom_ids.shape[0]
        self.ns_real = len(tsys.solute_ids)
        self.n_sites = 0 if tsys.spec is None else tsys.spec.n_sites
        n_buf_cons = (tsys.solute_constraints.n_constraints
                      if tsys.solute_constraints is not None else 0)
        self.ndof = (3 * (3 * self.n_waters + self.ns_real) - 3
                     - 3 * self.n_waters - n_buf_cons)
        self.e_corr = 0.0
        if kspace_ep is not None:
            self.e_corr = tforces.water_intra_ewald_correction(
                wm, self.n_waters, kspace_ep.alpha)
        if config.kspace_every < 1:
            raise ValueError("kspace_every must be >= 1")
        if (config.kspace_live_box and kspace_ep is not None
                and not isinstance(kspace_ep, PMEParams)):
            raise ValueError(
                "kspace_live_box requires PME: the factorized-Ewald params "
                "bake box-shaped structure-factor tables at build time "
                "(ops/ewald.py); use make_pme_params for NPT k-space")

    # -- forces ---------------------------------------------------------------

    def charges_solute(self, lam):
        ts = self.ts
        if ts.spec is None:
            return ts.solute.q0
        return lambda_dyn.charges(ts.solute.q0, ts.spec, lam)

    def compute_forces(self, st: TiledState,
                       need_tally: bool = False,
                       kspace_impulse: bool = False,
                       phi_recip_prev=None) -> TiledForces:
        """Forces + energies (+ per-atom water tallies when `need_tally`).

        The hot path skips the water eatom/φ per-atom tallies — only φ on
        SOLUTE atoms feeds dU/dλ (λ sites and buffer waters live in the
        solute set, layout.split_system), and water eatom is purely the
        compute_Hs diagnostic (fix_constant_pH.cpp:177-280 parity mode).

        `kspace_impulse` (set by the MD step / run loop, NOT by
        minimization or diagnostics): with cfg.kspace_every = k > 1, the
        reciprocal-space term is evaluated only when st.step % k == 0
        (under lax.cond — the skipped branch costs nothing at runtime) and
        its forces enter amplified ×k, so the two half-kicks around a
        boundary evaluation deliver the standard Verlet-I/r-RESPA impulse
        (LAMMPS `run_style respa` with kspace on the outer level). The
        caller passes the previous step's `phi_recip_prev` so λ forces
        between boundaries keep the slowly-varying reciprocal φ (the
        mollified slow-force treatment) instead of dropping the term — λ
        then integrates at the full rate at any kspace_every. φ and
        energies are NOT amplified; off-boundary rows report e_kspace = 0,
        so MTS conserved-quantity checks must sample h_conserved on
        boundary rows only."""
        ts = self.ts
        p = ts.params
        gx, gy, gz = p.grid
        W = p.W
        box = st.box
        style, alpha, rc = ts.coul_style, ts.alpha, ts.cutoff

        wxg = st.wx.reshape(3, gx, gy, gz, 3 * W)
        wvg = st.wvalid.reshape(gx, gy, gz, W)

        fast_ok = min(p.grid) >= 3 and not need_tally
        if fast_ok and self.use_pallas_ww == "fast":
            from constant_ph_tpu.tiled.pallas_ww import (
                water_water_pallas_fast)

            e_lj_ww, e_c_ww, f_ww = water_water_pallas_fast(
                wxg, ts.water, p, box, style=style, alpha=alpha, rc=rc)
            eatom_ww = jnp.zeros((gx, gy, gz, 3 * W), st.wx.dtype)
        elif fast_ok and not self.use_pallas_ww:
            e_lj_ww, e_c_ww, f_ww = tforces.water_water_fast(
                wxg, ts.water, p, box, style=style, alpha=alpha, rc=rc)
            eatom_ww = jnp.zeros((gx, gy, gz, 3 * W), st.wx.dtype)
        elif self.use_pallas_ww is True:
            from constant_ph_tpu.tiled.pallas_ww import water_water_pallas

            e_lj_ww, e_c_ww, f_ww, eatom_ww, phi_ww = water_water_pallas(
                wxg, wvg, ts.water, p, box, style=style, alpha=alpha, rc=rc)
        else:
            e_lj_ww, e_c_ww, f_ww, eatom_ww, phi_ww = tforces.water_water(
                wxg, wvg, ts.water, p, box, style=style, alpha=alpha, rc=rc)

        qs = self.charges_solute(st.lam)
        if fast_ok:
            e_lj_ws, e_c_ws, f_w_ws, f_s_ws, phi_s_ws = \
                tforces.water_solute_fast(
                    wxg, st.sx, qs, ts.solute, ts.water, p, box,
                    style=style, alpha=alpha, rc=rc)
            eatom_w_ws = jnp.zeros((gx, gy, gz, 3 * W), st.wx.dtype)
            eatom_s_ws = jnp.zeros_like(qs)
        else:
            (e_lj_ws, e_c_ws, f_w_ws, f_s_ws, eatom_w_ws, eatom_s_ws,
             phi_w_ws, phi_s_ws) = tforces.water_solute(
                wxg, wvg, st.sx, qs, ts.solute, ts.water, p, box,
                style=style, alpha=alpha, rc=rc)

        e_lj_ss, e_c_ss, f_ss, eatom_ss, phi_ss = tforces.solute_solute(
            st.sx, qs, ts.solute, box, style=style, alpha=alpha, rc=rc)

        fw = jnp.stack(
            [f_ww[d] + f_w_ws[d] for d in range(3)], axis=0
        ).reshape(3, self.G, 3 * W)
        fs = f_s_ws + f_ss
        eatom_w = (eatom_ww + eatom_w_ws).reshape(self.G, 3 * W)
        eatom_s = eatom_s_ws + eatom_ss
        phi_s = phi_s_ws + phi_ss

        e_bonded = jnp.zeros((), st.sx.dtype)
        if ts.bonded is not None and int(ts.bonded.bond_idx.shape[0]):
            eb, fb, eatom_b = bonded_forces(st.sx, box, ts.bonded)
            e_bonded = eb
            fs = fs + fb
            eatom_s = eatom_s + eatom_b

        e_kspace = jnp.zeros((), st.sx.dtype)
        phi_recip = jnp.zeros_like(qs)
        k_ev = self.cfg.kspace_every if kspace_impulse else 1
        if k_ev > 1 and need_tally:
            raise ValueError("per-atom tallies require a full kspace "
                             "evaluation (call without kspace_impulse)")
        if phi_recip_prev is None:
            phi_recip_prev = jnp.zeros_like(qs)
        if isinstance(self.kspace_ep, PMEParams):
            # FFT-based smooth PME on the cell tiles (ops/pme.py) — the
            # "PPPM as batched XLA FFTs" path; scatter-free spreading
            vm_atoms = jnp.repeat(st.wvalid, 3, axis=-1)       # (G, 3W)
            wqg = (self.wq_pat[None, :] * vm_atoms).reshape(
                gx, gy, gz, 3 * W)

            def _pme(_):
                ek, fwk, fsk, phi_sk, phi_wk = pme_recip_tiled(
                    wxg, wqg, st.sx, qs * ts.solute.smask, self.kspace_ep,
                    need_water_phi=need_tally,
                    box=st.box if self.cfg.kspace_live_box else None)
                if phi_wk is None:
                    phi_wk = jnp.zeros_like(wqg)
                return (ek + self.e_corr, fwk.reshape(3, self.G, 3 * W),
                        fsk, phi_sk, phi_wk)

            if k_ev > 1:
                skipped = (jnp.zeros((), st.sx.dtype),
                           jnp.zeros((3, self.G, 3 * W), st.sx.dtype),
                           jnp.zeros_like(st.sx),
                           phi_recip_prev,
                           jnp.zeros_like(wqg))
                ek, fwk, fsk, phi_sk, phi_wk = jax.lax.cond(
                    (st.step % k_ev) == 0, _pme, lambda _: skipped, None)
            else:
                ek, fwk, fsk, phi_sk, phi_wk = _pme(None)
            fw = fw + float(k_ev) * fwk
            fs = fs + float(k_ev) * fsk
            phi_recip = phi_sk
            if need_tally:
                eatom_w = eatom_w + (0.5 * wqg * phi_wk).reshape(
                    self.G, 3 * W)
                eatom_s = eatom_s + 0.5 * qs * ts.solute.smask * phi_sk
            e_kspace = ek
        elif self.kspace_ep is not None:
            vm_atoms = jnp.repeat(st.wvalid, 3, axis=-1)       # (G, 3W)
            qw = (self.wq_pat[None, :] * vm_atoms).reshape(-1)
            q_all = jnp.concatenate([qw, qs * ts.solute.smask])
            xd = tuple(
                jnp.concatenate([st.wx[d].reshape(-1), st.sx[:, d]])
                for d in range(3)
            )
            nw_flat = self.G * 3 * W

            def _ewald(_):
                ek, fk, phik, eatomk = ewald_recip_xd(
                    xd, q_all, self.kspace_ep)
                fwk = jnp.stack(
                    [(fk[d][:nw_flat]).reshape(self.G, 3 * W)
                     for d in range(3)]
                ) * vm_atoms[None].reshape(1, self.G, 3 * W)
                fsk = jnp.stack([fk[d][nw_flat:] for d in range(3)],
                                axis=-1)
                return (ek + self.e_corr, fwk, fsk, phik[nw_flat:],
                        eatomk)

            if k_ev > 1:
                skipped = (jnp.zeros((), st.sx.dtype),
                           jnp.zeros((3, self.G, 3 * W), st.sx.dtype),
                           jnp.zeros_like(st.sx),
                           phi_recip_prev,
                           jnp.zeros_like(q_all))
                ek, fwk, fsk, phi_sk, eatomk = jax.lax.cond(
                    (st.step % k_ev) == 0, _ewald, lambda _: skipped, None)
            else:
                ek, fwk, fsk, phi_sk, eatomk = _ewald(None)
            fw = fw + float(k_ev) * fwk
            fs = fs + float(k_ev) * fsk
            phi_recip = phi_sk
            eatom_w = eatom_w + eatomk[:nw_flat].reshape(self.G, 3 * W)
            eatom_s = eatom_s + eatomk[nw_flat:]
            e_kspace = ek

        phi_s = phi_s + phi_recip
        if ts.spec is not None:
            dUdlam = lambda_dyn.dq_dlambda_dot(ts.spec, phi_s)
            f_lam, u_site = lambda_dyn.lambda_force(
                st.lam, dUdlam, ts.spec, st.pH, self.cfg.T, self.bias)
            e_site = jnp.sum(u_site)
            if self.metad is not None:
                if st.metad_v.shape[0] != ts.spec.n_sites:
                    raise ValueError(
                        "state carries no metadynamics tables — init with "
                        "metad.init_tables and tst.replace(metad_v=..., "
                        "metad_dv=...)")
                from constant_ph_tpu import metad as metad_mod
                vb, dvb = metad_mod.lookup(
                    st.metad_v, st.metad_dv, st.lam, self.metad)
                f_lam = f_lam - dvb
                e_site = e_site + jnp.sum(vb)
        else:
            dUdlam = jnp.zeros((0,), st.sx.dtype)
            f_lam = jnp.zeros((0,), st.sx.dtype)
            e_site = jnp.zeros((), st.sx.dtype)

        return TiledForces(
            fw=fw, fs=fs, f_lam=f_lam,
            e_lj=e_lj_ww + e_lj_ws + e_lj_ss,
            e_coul=e_c_ww + e_c_ws + e_c_ss,
            e_bonded=e_bonded, e_kspace=e_kspace, e_site=e_site,
            eatom_w=eatom_w, eatom_s=eatom_s, phi_s=phi_s, dUdlam=dUdlam,
            phi_recip_s=phi_recip,
        )

    # -- diagnostics ------------------------------------------------------------

    def memory_usage(self) -> dict:
        """Byte accounting of the resident state/tables (the reference's
        memory_usage() hook, fix_constant_pH.cpp:314-318, generalized)."""
        A = 3 * self.W
        f4 = 4
        tiles = 2 * 3 * self.G * A * f4            # wx + wv
        masks = self.G * self.W * (f4 + 4)          # wvalid + wid
        Ns = int(self.ts.solute.q0.shape[0])
        solute = 2 * Ns * 3 * f4 + 4 * Ns * Ns * f4  # sx/sv + pair tables
        return {"water_tiles": tiles, "cell_masks": masks,
                "solute": solute, "total": tiles + masks + solute}

    def kinetic_energy(self, st: TiledState):
        vm_atoms = jnp.repeat(st.wvalid, 3, axis=-1)
        ke_w = 0.5 * units.MVV2E * jnp.sum(
            self.wmass[None, None, :] * st.wv * st.wv
            * vm_atoms[None, :, :])
        ke_s = 0.5 * units.MVV2E * jnp.sum(
            self.ts.solute.mass[:, None] * st.sv * st.sv
            * self.ts.solute.smask[:, None])
        return ke_w + ke_s

    def observe(self, st: TiledState, frc: TiledForces) -> Observables:
        ke = self.kinetic_energy(st)
        temp = 2.0 * ke / (self.ndof * units.BOLTZ)
        if self.ts.spec is not None:
            ke_lam = lambda_dyn.lambda_kinetic(st.v_lam, self.ts.spec)
            temp_lam = lambda_dyn.lambda_temperature(st.v_lam, self.ts.spec)
        else:
            ke_lam = jnp.zeros((), st.sx.dtype)
            temp_lam = jnp.zeros((), st.sx.dtype)
        # h_conserved is exact only on k-space boundary rows under
        # impulse MTS (off-boundary rows report e_kspace = 0 — see
        # compute_forces); h_valid masks them so downstream
        # conserved-quantity checks need no knowledge of kspace_every
        k_ev = self.cfg.kspace_every
        if self.kspace_ep is None or k_ev == 1:
            h_valid = jnp.array(True)
        else:
            h_valid = (st.step % k_ev) == 0
        return Observables(
            e_pot=frc.e_pot, e_lj=frc.e_lj, e_coul=frc.e_coul,
            e_bonded=frc.e_bonded, e_kspace=frc.e_kspace, e_site=frc.e_site,
            ke=ke, temp=temp, ke_lam=ke_lam, temp_lam=temp_lam,
            h_conserved=frc.e_pot + ke + ke_lam - st.ext_work,
            h_valid=h_valid, ext_work=st.ext_work,
            lam=st.lam, v_lam=st.v_lam, dUdlam=frc.dUdlam,
        )

    def compute_Hs(self, st: TiledState, frc: Optional[TiledForces] = None):
        """Reference-parity HA/HB eatom diagnostic (fix_constant_pH.cpp:
        177-280): HA = Σ eatom, HB excludes the titratable-H group."""
        if frc is None:
            frc = self.compute_forces(st, need_tally=True)
        vm_atoms = jnp.repeat(st.wvalid, 3, axis=-1)
        HA = (jnp.sum(frc.eatom_w * vm_atoms)
              + jnp.sum(frc.eatom_s * self.ts.solute.smask))
        HB = HA - jnp.sum(jnp.where(self.ts.groupH_mask, frc.eatom_s, 0.0))
        return HA, HB

    # -- integration ------------------------------------------------------------

    def _lam_kick_scale(self, step, offset):
        nev = self.cfg.lambda_nevery
        if nev <= 1 or self.ts.spec is None:
            return 1.0
        active = ((step + offset) % nev) == 0
        return jnp.where(active, float(nev), 0.0)

    def _reflect_lam(self, lam, v_lam):
        # FOLDING reflection (period-2L sawtooth), not a single mirror:
        # a hot walker whose half-drift overshoots BOTH walls (|Δλ| >
        # hi−lo; observed in the round-3/4 campaigns once the metad
        # edge-slope bug pumped v_λ to ~1.5/fs) would escape a single
        # 2·lo−λ mirror entirely. Folding maps ANY λ back into [lo, hi]
        # with the velocity flipped on odd legs — the wall is
        # impenetrable at any speed.
        lo, hi = self.cfg.lam_min, self.cfg.lam_max
        rng = hi - lo
        y = jnp.mod(lam - lo, 2.0 * rng)
        odd = y > rng
        lam_f = jnp.where(odd, 2.0 * rng - y, y) + lo
        v_f = jnp.where(odd, -v_lam, v_lam)
        return lam_f, v_f

    def _lam_drift(self, lam, v_lam, pH, h, inv_ml):
        """λ drift over h — λ-RESPA inner loop (cfg.lambda_inner).

        With lambda_inner > 1, runs lambda_inner//2 velocity-Verlet
        substeps against the ANALYTIC stiff force (Donnini wells + erf
        walls + pH driving, lambda_dyn.analytic_lambda_force — measured
        wall period 8.9 fs, 4.5 steps at dt=2: unresolved by the single-
        rate integrator and the cause of the round-5 λ-live PME NVE
        blowup). The expensive φ·dq and metadynamics forces stay on the
        outer step (their curvature is ≲2e2 kcal/mol — slow), whose
        kicks then carry f_lam MINUS the analytic part. Cost: S-element
        closed forms per substep — invisible next to the pair stencil.
        lambda_inner == 1 is the legacy single-rate drift."""
        m = self.cfg.lambda_inner // 2
        if m <= 0 or self.ts.spec is None:
            return lam + h * v_lam, v_lam
        hs = h / m
        spec, T, bias = self.ts.spec, self.cfg.T, self.bias
        for _ in range(m):
            f = lambda_dyn.analytic_lambda_force(lam, spec, pH, T, bias)
            v_lam = v_lam + (0.5 * hs) * f * inv_ml
            lam = lam + hs * v_lam
            f = lambda_dyn.analytic_lambda_force(lam, spec, pH, T, bias)
            v_lam = v_lam + (0.5 * hs) * f * inv_ml
        return lam, v_lam

    def _lam_slow_force(self, f_lam, lam, pH):
        """Outer-step λ force: total minus the analytic part the inner
        loop integrates (exact split — both use the same closed forms)."""
        if self.cfg.lambda_inner // 2 <= 0 or self.ts.spec is None:
            return f_lam
        return f_lam - lambda_dyn.analytic_lambda_force(
            lam, self.ts.spec, pH, self.cfg.T, self.bias)

    def _cap_forces(self, frc: TiledForces) -> TiledForces:
        cap = self.cfg.force_cap
        if cap <= 0.0:
            return frc
        wnorm = jnp.sqrt(jnp.sum(frc.fw * frc.fw, axis=0, keepdims=True)
                         + 1e-12)
        fw = frc.fw * jnp.minimum(1.0, cap / wnorm)
        snorm = jnp.sqrt(jnp.sum(frc.fs * frc.fs, axis=-1, keepdims=True)
                         + 1e-12)
        fs = frc.fs * jnp.minimum(1.0, cap / snorm)
        return frc.replace(fw=fw, fs=fs)

    def step(self, st: TiledState, frc: TiledForces):
        cfg = self.cfg
        ts = self.ts
        dt = cfg.dt
        dtype = st.sx.dtype
        has_lam = ts.spec is not None
        move_lam = has_lam and not cfg.lambda_frozen
        frc = self._cap_forces(frc)

        vm_atoms = jnp.repeat(st.wvalid, 3, axis=-1)[None]   # (1, G, 3W)
        inv_mw = (units.FTM2V / self.wmass)[None, None, :]
        inv_ms = units.FTM2V / ts.solute.mass[:, None]
        if has_lam:
            inv_ml = units.FTM2V / ts.spec.m_lambda

        key = st.key
        wv, sv, v_lam = st.wv, st.sv, st.v_lam
        wx, sx, lam = st.wx, st.sx, st.lam

        use_nhc = cfg.thermostat == "nhc"
        nhc_xi, nhc_lam_xi = st.nhc_xi, st.nhc_lam_xi
        kT = units.BOLTZ * cfg.T
        # cumulative thermostat energy injection (see SystemState.ext_work):
        # exact KE telescoping makes h_conserved an oracle in every mode
        ext_work = st.ext_work

        def ke_vel(wv_, sv_):
            ke_w = 0.5 * units.MVV2E * jnp.sum(
                self.wmass[None, None, :] * wv_ * wv_ * vm_atoms)
            ke_s = 0.5 * units.MVV2E * jnp.sum(
                ts.solute.mass[:, None] * sv_ * sv_
                * ts.solute.smask[:, None])
            return ke_w + ke_s

        if use_nhc:
            ke2 = 2.0 * ke_vel(wv, sv)
            scale, nhc_xi = nhc_halfstep(nhc_xi, ke2, self.ndof, kT,
                                         cfg.tau, dt)
            wv = wv * scale
            sv = sv * scale
            ext_work = ext_work + 0.5 * ke2 * (scale * scale - 1.0)
        if move_lam and cfg.lambda_thermostat == "nhc":
            ke2l = 2.0 * lambda_dyn.lambda_kinetic(v_lam, ts.spec)
            scale_l, nhc_lam_xi = nhc_halfstep(
                nhc_lam_xi, ke2l, self.n_sites, kT, cfg.lambda_tau, dt)
            v_lam = v_lam * scale_l
            ext_work = ext_work + 0.5 * ke2l * (scale_l * scale_l - 1.0)

        # B
        wv = wv + (0.5 * dt) * frc.fw * inv_mw * vm_atoms
        sv = sv + (0.5 * dt) * frc.fs * inv_ms
        if move_lam:
            k1 = self._lam_kick_scale(st.step, 0)
            v_lam = v_lam + (0.5 * dt) * k1 * self._lam_slow_force(
                frc.f_lam, st.lam, st.pH) * inv_ml

        if cfg.thermostat == "langevin" or (
            move_lam and cfg.lambda_thermostat == "langevin"
        ):
            key, kw, ks_, kl = jax.random.split(key, 4)

        # A
        wx = wx + (0.5 * dt) * wv
        sx = sx + (0.5 * dt) * sv
        if move_lam:
            lam, v_lam = self._lam_drift(lam, v_lam, st.pH, 0.5 * dt,
                                         inv_ml)

        # O (Langevin OU) — the OU heat feeds ext_work so h_conserved
        # tracks the Langevin effective energy. The heat is measured on
        # CONSTRAINT-PROJECTED COPIES of the velocities (dynamics
        # untouched): raw ΔKE would book (a) the B-kick's large
        # deterministic constraint-violating components (which end-of-
        # step RATTLE removes every step, Langevin or not — they cancel
        # between the two projected measurements) and (b) the noise
        # injected along constraint directions (which SHAKE/RATTLE also
        # removes before it ever reaches the tracked energy) — both
        # would leak h_conserved by ~tens of kcal/mol/step (measured;
        # tests/test_conserved.py).
        if cfg.thermostat == "langevin":

            def ke_proj(wv_, sv_):
                wv_p = self.shake.velocities(wx, wv_, st.box, st.wvalid)
                sv_p = (ts.solute_constraints.velocities(sx, sv_, st.box)
                        if ts.solute_constraints is not None else sv_)
                return ke_vel(wv_p, sv_p)

            ke_o0 = ke_proj(wv, sv)
            c1 = jnp.exp(-cfg.gamma * dt)
            sig_w = jnp.sqrt((1.0 - c1 * c1) * kT
                             / (self.wmass * units.MVV2E))[None, None, :]
            wv = c1 * wv + sig_w * vm_atoms * jax.random.normal(
                kw, wv.shape, dtype=dtype)
            sig_s = jnp.sqrt((1.0 - c1 * c1) * kT
                             / (ts.solute.mass * units.MVV2E))[:, None]
            sv = c1 * sv + sig_s * ts.solute.smask[:, None] \
                * jax.random.normal(ks_, sv.shape, dtype=dtype)
            ext_work = ext_work + ke_proj(wv, sv) - ke_o0
        if move_lam and cfg.lambda_thermostat == "langevin":
            kel_o0 = lambda_dyn.lambda_kinetic(v_lam, ts.spec)
            c1l = jnp.exp(-cfg.lambda_gamma * dt)
            sig_l = jnp.sqrt((1.0 - c1l * c1l) * kT
                             / (ts.spec.m_lambda * units.MVV2E))
            v_lam = c1l * v_lam + sig_l * jax.random.normal(
                kl, v_lam.shape, dtype=dtype)
            ext_work = (ext_work
                        + lambda_dyn.lambda_kinetic(v_lam, ts.spec)
                        - kel_o0)

        # A
        wx = wx + (0.5 * dt) * wv
        sx = sx + (0.5 * dt) * sv
        if move_lam:
            lam, v_lam = self._lam_drift(lam, v_lam, st.pH, 0.5 * dt,
                                         inv_ml)
            lam, v_lam = self._reflect_lam(lam, v_lam)

        # SHAKE water (tiled, regular) + buffer-water solute constraints
        wx, wv = self.shake.positions(st.wx, wx, wv, st.box, dt, st.wvalid)
        if ts.solute_constraints is not None:
            sx, sv = ts.solute_constraints.positions(st.sx, sx, sv, st.box, dt)

        # step increments BEFORE the force eval: compute_forces sees the
        # post-drift counter, so its MTS boundary predicate (step % k == 0)
        # agrees between this eval (positions x_{c+1}, counter c+1) and the
        # block-start recompute in make_run (positions x_c, counter c after
        # rebin) — otherwise every rebuild injects a spurious extra k-space
        # half-impulse and the conserved quantity drifts ~1000x worse
        st_new = st.replace(wx=wx, sx=sx, lam=lam, step=st.step + 1)
        frc_new = self.compute_forces(st_new, kspace_impulse=True,
                                      phi_recip_prev=frc.phi_recip_s)
        frc_capped = self._cap_forces(frc_new)

        # B
        wv = wv + (0.5 * dt) * frc_capped.fw * inv_mw * vm_atoms
        sv = sv + (0.5 * dt) * frc_capped.fs * inv_ms
        if move_lam:
            k2 = self._lam_kick_scale(st.step, 1)
            v_lam = v_lam + (0.5 * dt) * k2 * self._lam_slow_force(
                frc_new.f_lam, lam, st.pH) * inv_ml

        if use_nhc:
            ke2 = 2.0 * ke_vel(wv, sv)
            scale, nhc_xi = nhc_halfstep(nhc_xi, ke2, self.ndof, kT,
                                         cfg.tau, dt)
            # book the thermostat's work on CONSTRAINT-PROJECTED KE: the
            # post-B-kick velocities still carry constraint-violating
            # components that end-of-step RATTLE removes, so the true
            # injection into the tracked energy is 0.5·ke2_proj·(s²−1)
            # (projection is linear ⇒ commutes with the uniform scale;
            # raw ke2 stays the nhc_halfstep input — same dynamics, same
            # reasoning as the Langevin ke_proj above)
            wv_p = self.shake.velocities(wx, wv, st.box, st.wvalid)
            sv_p = (ts.solute_constraints.velocities(sx, sv, st.box)
                    if ts.solute_constraints is not None else sv)
            ke2_p = 2.0 * ke_vel(wv_p, sv_p)
            wv = wv * scale
            sv = sv * scale
            ext_work = ext_work + 0.5 * ke2_p * (scale * scale - 1.0)
        if move_lam and cfg.lambda_thermostat == "nhc":
            ke2l = 2.0 * lambda_dyn.lambda_kinetic(v_lam, ts.spec)
            scale_l, nhc_lam_xi = nhc_halfstep(
                nhc_lam_xi, ke2l, self.n_sites, kT, cfg.lambda_tau, dt)
            v_lam = v_lam * scale_l
            ext_work = ext_work + 0.5 * ke2l * (scale_l * scale_l - 1.0)

        # RATTLE
        wv = self.shake.velocities(wx, wv, st.box, st.wvalid)
        if ts.solute_constraints is not None:
            sv = ts.solute_constraints.velocities(sx, sv, st.box)

        return st_new.replace(
            wv=wv, sv=sv, v_lam=v_lam, key=key,
            nhc_xi=nhc_xi, nhc_lam_xi=nhc_lam_xi, ext_work=ext_work,
        ), frc_new

    # -- minimization (FIRE on tiles, constraints enforced every move) --------

    def make_minimize(self, n_steps: int, *, dt_start=0.3, dt_max=0.6,
                      f_inc=1.1, f_dec=0.5, alpha_start=0.1, f_alpha=0.99,
                      n_min=5, max_move=0.05):
        """FIRE relaxation of the tiled system (λ held fixed); rigid-water
        constraints are projected every move so H atoms cannot dive into a
        neighbor's Coulomb well (see minimize.fire_minimize)."""
        block = self.cfg.rebuild_every
        n_blocks = -(-n_steps // block)
        inv_mw = (units.FTM2V / self.wmass)[None, None, :]
        inv_ms = units.FTM2V / self.ts.solute.mass[:, None]

        def fire_step(carry, _):
            st, vw, vs, dtf, al, n_pos = carry
            frc = self.compute_forces(st)
            vm = jnp.repeat(st.wvalid, 3, axis=-1)[None]
            fw = frc.fw * vm
            fs = frc.fs * self.ts.solute.smask[:, None]
            vw = vw + dtf * fw * inv_mw
            vs = vs + dtf * fs * inv_ms
            power = jnp.sum(fw * vw) + jnp.sum(fs * vs)
            f_norm = jnp.sqrt(jnp.sum(fw * fw) + jnp.sum(fs * fs) + 1e-20)
            v_norm = jnp.sqrt(jnp.sum(vw * vw) + jnp.sum(vs * vs) + 1e-20)
            mix = v_norm / f_norm
            vw_m = (1.0 - al) * vw + al * fw * mix
            vs_m = (1.0 - al) * vs + al * fs * mix
            uphill = power < 0.0
            vw = jnp.where(uphill, 0.0, vw_m)
            vs = jnp.where(uphill, 0.0, vs_m)
            n_pos = jnp.where(uphill, 0, n_pos + 1)
            grow = (n_pos > n_min) & ~uphill
            dtf = jnp.where(grow, jnp.minimum(dtf * f_inc, dt_max),
                            jnp.where(uphill, dtf * f_dec, dtf))
            al = jnp.where(grow, al * f_alpha,
                           jnp.where(uphill, alpha_start, al))
            dxw = dtf * vw
            lw = jnp.sqrt(jnp.sum(dxw * dxw, axis=0, keepdims=True) + 1e-20)
            dxw = dxw * jnp.minimum(1.0, max_move / lw)
            dxs = dtf * vs
            ls = jnp.sqrt(jnp.sum(dxs * dxs, axis=-1, keepdims=True) + 1e-20)
            dxs = dxs * jnp.minimum(1.0, max_move / ls)
            wx_new = st.wx + dxw * vm
            sx_new = st.sx + dxs
            wx_new, _ = self.shake.positions(
                st.wx, wx_new, jnp.zeros_like(vw), st.box, 1.0, st.wvalid)
            if self.ts.solute_constraints is not None:
                sx_new, _ = self.ts.solute_constraints.positions(
                    st.sx, sx_new, jnp.zeros_like(vs), st.box, 1.0)
            st = st.replace(wx=wx_new, sx=sx_new)
            return (st, vw, vs, dtf, al, n_pos), frc.e_pot

        def block_fn(carry, _):
            st, vw, vs, dtf, al, n_pos = carry
            st, _ = rebin(st, self.ts.params)
            # restart FIRE each block: keeps the adaptive dt from running
            # away against the constraint projections
            vw = jnp.zeros_like(vw)
            vs = jnp.zeros_like(vs)
            dtf = jnp.minimum(dtf, jnp.asarray(dt_start, dtf.dtype))
            carry, e = jax.lax.scan(
                fire_step, (st, vw, vs, dtf, al, n_pos), None, length=block)
            return carry, e[-1]

        def minimize(st: TiledState):
            dtype = st.sx.dtype
            carry0 = (
                st, jnp.zeros_like(st.wv), jnp.zeros_like(st.sv),
                jnp.asarray(dt_start, dtype), jnp.asarray(alpha_start, dtype),
                jnp.array(0, jnp.int32),
            )
            (st, *_), e_hist = jax.lax.scan(
                block_fn, carry0, None, length=n_blocks)
            return st.replace(wv=jnp.zeros_like(st.wv),
                              sv=jnp.zeros_like(st.sv)), e_hist

        return minimize

    # -- run loop ------------------------------------------------------------

    def make_run(self, n_steps: int, detailed_flags: bool = False):
        """Jittable run loop: rebin + `rebuild_every`-step blocks.

        Returns (state, overflow, obs). `overflow` is the OR of the
        capacity flag (rebin's early slot-full warning) and the
        dangerous-build drift flag; with ``detailed_flags=True`` it is
        the pair (capacity, drift) instead, so drivers can retile on the
        former and merely count the latter (ROADMAP item 6 — replaces
        the elastic driver's retry heuristic)."""
        block = self.cfg.rebuild_every
        n_blocks = -(-n_steps // block)

        # Dangerous-build monitor (LAMMPS `neigh_modify check` analog):
        # only water-water relies on stencil coverage (solute blocks are
        # all-pairs), and cells are sized so coverage holds while no two
        # molecules approach by more than `skin` between rebins. A single
        # molecule moving < skin/2 is GUARANTEED safe; moving > skin means
        # a violation is possible — that certainly-dangerous case is OR'd
        # into the overflow flag (the gray zone in between is accepted, as
        # in LAMMPS dangerous-build accounting, because legitimate thermal
        # tails would otherwise false-positive). Water is rigid, so O-row
        # drift measures molecule translation without vibration noise.
        drift_budget = self.ts.params.skin

        def run(st: TiledState):
            def outer(carry, _):
                st, ov_cap, ov_drift = carry
                st, ov = rebin(st, self.ts.params)
                ov_cap = ov_cap | ov
                frc = self.compute_forces(st, kspace_impulse=True,
                                          phi_recip_prev=st.phi_recip_s)
                wxO0 = st.wx[:, :, 0::3]

                def inner(c, _):
                    s, f = c
                    s, f = self.step(s, f)
                    return (s, f), self.observe(s, f)

                (st, frc), obs = jax.lax.scan(
                    inner, (st, frc), None, length=block)
                # rows keep their identity within a block (rebinning only
                # moves rows at block start), so plain differences measure
                # true drift; parked rows don't move
                dw2 = jnp.sum((st.wx[:, :, 0::3] - wxO0) ** 2, axis=0)
                ov_drift = ov_drift | (jnp.max(dw2) > drift_budget ** 2)
                # persist the k-space MTS carry in the state so the next
                # make_run invocation (elastic/NPT chunks may not start on
                # a kspace_every boundary) keeps the stale-φ λ coupling
                # instead of silently dropping the reciprocal term
                st = st.replace(phi_recip_s=frc.phi_recip_s)
                if self.metad is not None and not self.metad_frozen:
                    from constant_ph_tpu import metad as metad_mod

                    # deposit one hill when this block crossed a stride
                    # boundary (block start step ≡ st.step − block after
                    # the inner scan); stride < block degrades gracefully
                    # to one hill per block
                    stride = self.metad.stride
                    mv, mdv = jax.lax.cond(
                        (st.step - block) % stride < block,
                        lambda vs: metad_mod.deposit(
                            vs[0], vs[1], st.lam, self.metad),
                        lambda vs: vs,
                        (st.metad_v, st.metad_dv))
                    # the deposit raises e_site by ΔV(λ) discontinuously;
                    # account it in ext_work so h_conserved stays an
                    # oracle during active-deposit runs (no-op when the
                    # cond did not fire: mv == st.metad_v)
                    dV = (metad_mod.lookup(mv, mdv, st.lam, self.metad)[0]
                          - metad_mod.lookup(st.metad_v, st.metad_dv,
                                             st.lam, self.metad)[0])
                    st = st.replace(metad_v=mv, metad_dv=mdv,
                                    ext_work=st.ext_work + jnp.sum(dV))
                return (st, ov_cap, ov_drift), obs

            (st, ov_cap, ov_drift), obs = jax.lax.scan(
                outer,
                (st, jnp.array(False), jnp.array(False)),
                None, length=n_blocks)
            obs = jax.tree.map(
                lambda a: a.reshape((n_blocks * block,) + a.shape[2:]), obs)
            if detailed_flags:
                return st, (ov_cap, ov_drift), obs
            return st, ov_cap | ov_drift, obs

        return run

    def run(self, st: TiledState, n_steps: int):
        return jax.jit(self.make_run(n_steps))(st)
