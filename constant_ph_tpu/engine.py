"""The MD engine: one jitted step composing all physics, plus the run loop.

This is the TPU-native restatement of the reference's host timestep loop +
fix lifecycle (SURVEY.md §3.3): instead of LAMMPS calling post_force hooks
each step, the step function is built from pure potential terms at trace
time and the whole pipeline — pair forces, λ forces with exact dU/dλ,
integrator, thermostats — is one fused XLA program driven by lax.scan.

Reference call-stack parity:
- the per-step orchestration (compute energies → λ force → integrate λ)
  mirrors post_force (fix_constant_pH.cpp:67-79) but with the λ-coupling
  done the way the reference says it should be (q(λ) before force
  evaluation, fix_constant_pH.cpp:156-161) instead of force rescaling;
- `nevery` multiple-timestep λ updates (fix_constant_pH.cpp:69, 113) are
  an impulse (r-RESPA-style) scheme: λ is kicked with dt_λ = nevery·dt at
  λ-steps and drifts every step;
- compute_Hs-style HA/HB diagnostics (fix_constant_pH.cpp:177-280) are
  retained as a cross-validation observable via per-atom energy tallies.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import lambda_dyn, units
from constant_ph_tpu.forcefield import ForceField
from constant_ph_tpu.integrators import (
    kinetic_energy,
    langevin_o_step,
    nhc_halfstep,
)
from constant_ph_tpu.lambda_dyn import BiasParams, LambdaSpec
from constant_ph_tpu.neighbors import (
    NeighborList,
    NeighborParams,
    build_neighbor_list,
)
from constant_ph_tpu.ops.pair import pair_forces
from constant_ph_tpu.state import SystemState


@struct.dataclass
class EngineConfig:
    """Static run configuration (SURVEY.md §5.6 config system)."""

    dt: float = struct.field(pytree_node=False, default=1.0)      # fs
    T: float = struct.field(pytree_node=False, default=300.0)     # K
    thermostat: str = struct.field(pytree_node=False, default="langevin")
    gamma: float = struct.field(pytree_node=False, default=0.001)  # 1/fs
    tau: float = struct.field(pytree_node=False, default=100.0)    # fs (NHC)
    # λ-dynamics controls (ref args: nevery, T — fix_constant_pH.cpp:37, 49)
    lambda_nevery: int = struct.field(pytree_node=False, default=1)
    lambda_thermostat: str = struct.field(pytree_node=False, default="langevin")
    lambda_gamma: float = struct.field(pytree_node=False, default=0.005)
    lambda_tau: float = struct.field(pytree_node=False, default=200.0)
    # λ-RESPA: sub-step λ against the ANALYTIC stiff force (Donnini
    # wells + erf walls + pH driving; lambda_dyn.analytic_lambda_force)
    # lambda_inner times per MD step, keeping the expensive φ·dq and
    # metadynamics forces on the outer step. The walls' 8.9 fs period is
    # 4.5 steps at dt=2 — unresolved Verlet → unbounded λ heating on a
    # tilted landscape (measured round 5); 8 substeps resolve it at
    # negligible cost (S-element closed forms). 1 = legacy single-rate.
    lambda_inner: int = struct.field(pytree_node=False, default=8)
    rebuild_every: int = struct.field(pytree_node=False, default=20)
    # k-space multiple-timestepping (impulse / Verlet-I): evaluate the
    # reciprocal-space term every `kspace_every` steps and apply it as an
    # amplified impulse in the two half-kicks around the evaluation — the
    # RESPA outer level LAMMPS puts kspace on (run_style respa). λ forces
    # between boundaries keep the previous boundary's reciprocal φ
    # (mollified slow force), so lambda_nevery is unconstrained. Impulse
    # MTS trades conserved-quantity quality for speed (measured on v5e,
    # 24k atoms, PME, λ frozen: k=2 ⇒ 3.3e-2 kT/atom/ns vs 2.1e-3 at k=1;
    # k=4 resonates and is NOT safe for NVE) — use with a thermostat,
    # where the residual heating is ~1e-4 relative at k≤3. Tiled engine
    # only.
    kspace_every: int = struct.field(pytree_node=False, default=1)
    # per-atom force-norm cap in kcal/mol/Å (0 = off) — the LAMMPS
    # nve/limit-style equilibration guard for clashed starting configs
    force_cap: float = struct.field(pytree_node=False, default=0.0)
    # reflective λ backstop walls: beyond the erf bias walls the wall force
    # vanishes (exp underflow) and a large transient dU/dλ could eject λ;
    # reflection far outside [0,1] is ensemble-neutral (never thermally
    # reached) but guarantees boundedness
    lam_min: float = struct.field(pytree_node=False, default=-0.5)
    lam_max: float = struct.field(pytree_node=False, default=1.5)
    # freeze λ at its current value (thermodynamic-integration windows for
    # ΔG_ref calibration sample dU/dλ at fixed λ)
    lambda_frozen: bool = struct.field(pytree_node=False, default=False)
    # derive the PME influence function / spacing / volume from the LIVE
    # state box each k-space evaluation (ops/pme.pme_influence) instead of
    # the params' baked build-time box — required under an NPT barostat
    # (tiled/npt.py); costs ~M³/2 elementwise exps per evaluation. PME +
    # tiled engine only (factorized Ewald keeps the baked box: its
    # structure-factor tables are box-shaped at build time).
    kspace_live_box: bool = struct.field(pytree_node=False, default=False)


@struct.dataclass
class Forces:
    f: jax.Array          # (N, 3)
    f_lam: jax.Array      # (S,)
    e_lj: jax.Array
    e_coul: jax.Array
    e_bonded: jax.Array
    e_kspace: jax.Array
    e_site: jax.Array     # Σ bias + pH terms over sites
    eatom: jax.Array      # (N,) per-atom tally (the eatom contract)
    phi: jax.Array        # (N,) ∂U/∂q
    dUdlam: jax.Array     # (S,)

    @property
    def e_pot(self):
        return self.e_lj + self.e_coul + self.e_bonded + self.e_kspace + self.e_site


@struct.dataclass
class Observables:
    """Per-step observables (SURVEY.md §5.5) — the compute_scalar/vector
    analog (fix_constant_pH.h:37-38): λ, v_λ, energies, temperatures, and
    the conserved quantity."""

    e_pot: jax.Array
    e_lj: jax.Array
    e_coul: jax.Array
    e_bonded: jax.Array
    e_kspace: jax.Array
    e_site: jax.Array
    ke: jax.Array
    temp: jax.Array
    ke_lam: jax.Array
    temp_lam: jax.Array
    # E_tot − ext_work: the H_λ-style conservation oracle
    # (fix_constant_pH.cpp:114). ext_work subtracts every accounted
    # non-Hamiltonian injection (NHC/Langevin thermostat scalings, metad
    # hill deposits), so bounded drift is expected in ALL modes — not
    # just NVE. Force-cap events are NOT accounted (they are flagged by
    # the overflow output instead). Under k-space impulse MTS the value
    # is exact only where h_valid is True (reciprocal-boundary rows).
    h_conserved: jax.Array
    # True where h_conserved is an exact total (always, except
    # off-boundary rows under kspace_every > 1, whose e_kspace is 0)
    h_valid: jax.Array
    # cumulative thermostat+metad energy injection (state.ext_work)
    ext_work: jax.Array
    lam: jax.Array           # (S,)
    v_lam: jax.Array         # (S,)
    dUdlam: jax.Array        # (S,)


class Engine:
    """Composes a force field (+ optional λ sites + extra potential hooks)
    into jitted step/run functions.

    ``extra_potentials`` is the fix/hook protocol (SURVEY.md layer B): each
    entry is a pure fn (x, q, box) -> (energy, force, phi, eatom) composed
    into the energy at trace time — the TPU-native Fix registry
    (fix_constant_pH.h:15-18 analog).
    """

    def __init__(
        self,
        ff: ForceField,
        nbr_params: NeighborParams,
        config: EngineConfig = EngineConfig(),
        spec: Optional[LambdaSpec] = None,
        bias: BiasParams = BiasParams(),
        extra_potentials: tuple = (),
        bonded_fn: Optional[Callable] = None,
        kspace_fn: Optional[Callable] = None,
        constraints=None,
    ):
        self.ff = ff
        self.nbr_params = nbr_params
        self.cfg = config
        self.spec = spec
        self.bias = bias
        self.extra_potentials = tuple(extra_potentials)
        self.bonded_fn = bonded_fn
        self.kspace_fn = kspace_fn
        self.constraints = constraints
        self.n_constraints = 0 if constraints is None else constraints.n_constraints
        self.n_sites = 0 if spec is None else spec.n_sites
        if config.kspace_every > 1:
            raise ValueError(
                "kspace_every > 1 (k-space impulse MTS) is implemented in "
                "TiledEngine only; the canonical Engine evaluates k-space "
                "every step")
        if config.kspace_live_box:
            raise ValueError(
                "kspace_live_box (NPT k-space) is implemented in "
                "TiledEngine + PME only")

    # -- neighbor structure -------------------------------------------------

    def build_neighbors(self, x, box) -> NeighborList:
        return build_neighbor_list(
            x, box, self.nbr_params, self.ff.excl_idx, self.ff.excl_code
        )

    # -- forces ---------------------------------------------------------------

    def charges(self, lam):
        if self.spec is None:
            return self.ff.q0
        return lambda_dyn.charges(self.ff.q0, self.spec, lam)

    def compute_forces(self, x, lam, box, pH, nbr: NeighborList) -> Forces:
        ff = self.ff
        q = self.charges(lam)
        pr = pair_forces(x, q, ff.type, box, nbr, ff.pair)
        f = pr.force
        phi = pr.phi
        eatom = pr.eatom
        e_bonded = jnp.zeros((), dtype=x.dtype)
        e_kspace = jnp.zeros((), dtype=x.dtype)

        if self.bonded_fn is not None:
            eb, fb, eatom_b = self.bonded_fn(x, box)
            e_bonded = e_bonded + eb
            f = f + fb
            eatom = eatom + eatom_b
        if self.kspace_fn is not None:
            ek, fk, phik, eatom_k = self.kspace_fn(x, q, box)
            e_kspace = e_kspace + ek
            f = f + fk
            phi = phi + phik
            eatom = eatom + eatom_k
        for pot in self.extra_potentials:
            ep, fp, phip, eatom_p = pot(x, q, box)
            e_bonded = e_bonded + ep
            f = f + fp
            phi = phi + phip
            eatom = eatom + eatom_p

        if self.spec is not None:
            dUdlam = lambda_dyn.dq_dlambda_dot(self.spec, phi)
            f_lam, u_site = lambda_dyn.lambda_force(
                lam, dUdlam, self.spec, pH, self.cfg.T, self.bias
            )
            e_site = jnp.sum(u_site)
        else:
            dUdlam = jnp.zeros((0,), dtype=x.dtype)
            f_lam = jnp.zeros((0,), dtype=x.dtype)
            e_site = jnp.zeros((), dtype=x.dtype)

        return Forces(
            f=f, f_lam=f_lam,
            e_lj=pr.e_lj, e_coul=pr.e_coul,
            e_bonded=e_bonded, e_kspace=e_kspace, e_site=e_site,
            eatom=eatom, phi=phi, dUdlam=dUdlam,
        )

    # -- observables ----------------------------------------------------------

    def observe(self, state: SystemState, frc: Forces) -> Observables:
        ff = self.ff
        ke = kinetic_energy(state.v, ff.mass)
        ndof = 3 * state.x.shape[0] - 3 - self.n_constraints
        temp = 2.0 * ke / (ndof * units.BOLTZ)
        if self.spec is not None:
            ke_lam = lambda_dyn.lambda_kinetic(state.v_lam, self.spec)
            temp_lam = lambda_dyn.lambda_temperature(state.v_lam, self.spec)
        else:
            ke_lam = jnp.zeros((), dtype=state.x.dtype)
            temp_lam = jnp.zeros((), dtype=state.x.dtype)
        return Observables(
            e_pot=frc.e_pot,
            e_lj=frc.e_lj, e_coul=frc.e_coul, e_bonded=frc.e_bonded,
            e_kspace=frc.e_kspace, e_site=frc.e_site,
            ke=ke, temp=temp, ke_lam=ke_lam, temp_lam=temp_lam,
            h_conserved=frc.e_pot + ke + ke_lam - state.ext_work,
            h_valid=jnp.array(True),
            ext_work=state.ext_work,
            lam=state.lam, v_lam=state.v_lam, dUdlam=frc.dUdlam,
        )

    # -- one MD step ----------------------------------------------------------

    def _lam_kick_scale(self, step, offset):
        """Impulse-MTS λ kick factor: nevery at λ-steps, 0 otherwise."""
        nev = self.cfg.lambda_nevery
        if nev <= 1 or self.spec is None:
            return 1.0
        active = ((step + offset) % nev) == 0
        return jnp.where(active, float(nev), 0.0)

    def _lam_drift(self, lam, v_lam, pH, h, inv_ml):
        """λ-RESPA inner drift: lambda_inner//2 velocity-Verlet substeps
        against the analytic stiff force (wells + walls + pH driving) —
        see tiled/engine.py._lam_drift for the measured stiffness story.
        lambda_inner == 1 is the legacy single-rate drift."""
        m = self.cfg.lambda_inner // 2
        if m <= 0 or self.spec is None:
            return lam + h * v_lam, v_lam
        hs = h / m
        for _ in range(m):
            f = lambda_dyn.analytic_lambda_force(
                lam, self.spec, pH, self.cfg.T, self.bias)
            v_lam = v_lam + (0.5 * hs) * f * inv_ml
            lam = lam + hs * v_lam
            f = lambda_dyn.analytic_lambda_force(
                lam, self.spec, pH, self.cfg.T, self.bias)
            v_lam = v_lam + (0.5 * hs) * f * inv_ml
        return lam, v_lam

    def _lam_slow_force(self, f_lam, lam, pH):
        """Outer λ force: total minus the part the inner loop owns."""
        if self.cfg.lambda_inner // 2 <= 0 or self.spec is None:
            return f_lam
        return f_lam - lambda_dyn.analytic_lambda_force(
            lam, self.spec, pH, self.cfg.T, self.bias)

    def _reflect_lam(self, lam, v_lam):
        # folding reflection — impenetrable at any |Δλ| (a single mirror
        # lets a drift longer than hi−lo escape; see tiled engine)
        lo, hi = self.cfg.lam_min, self.cfg.lam_max
        rng = hi - lo
        y = jnp.mod(lam - lo, 2.0 * rng)
        odd = y > rng
        lam_f = jnp.where(odd, 2.0 * rng - y, y) + lo
        v_f = jnp.where(odd, -v_lam, v_lam)
        return lam_f, v_f

    def step(self, state: SystemState, frc: Forces, nbr: NeighborList):
        """One BAOAB/VV/NHC step for atoms and λ. Returns (state', frc')."""
        cfg = self.cfg
        ff = self.ff
        dt = cfg.dt
        inv_m = units.FTM2V / ff.mass[:, None]
        has_lam = self.spec is not None
        move_lam = has_lam and not cfg.lambda_frozen
        if has_lam:
            inv_ml = units.FTM2V / self.spec.m_lambda

        key = state.key
        v, v_lam = state.v, state.v_lam
        x, lam = state.x, state.lam

        use_nhc = cfg.thermostat == "nhc"
        nhc_xi, nhc_lam_xi = state.nhc_xi, state.nhc_lam_xi
        ndof = 3 * x.shape[0] - 3 - self.n_constraints
        kT = units.BOLTZ * cfg.T
        # ext_work accumulates the KE change of every thermostat operation
        # (exact telescoping: the bath touches the system ONLY through
        # velocity updates), making h_conserved a valid oracle under NHC
        # and Langevin, not just NVE
        ext_work = state.ext_work

        if use_nhc:
            ke2 = 2.0 * kinetic_energy(v, ff.mass)
            scale, nhc_xi = nhc_halfstep(nhc_xi, ke2, ndof, kT, cfg.tau, dt)
            v = v * scale
            ext_work = ext_work + 0.5 * ke2 * (scale * scale - 1.0)
        if move_lam and cfg.lambda_thermostat == "nhc":
            ke2l = 2.0 * lambda_dyn.lambda_kinetic(v_lam, self.spec)
            scale_l, nhc_lam_xi = nhc_halfstep(
                nhc_lam_xi, ke2l, self.n_sites, kT, cfg.lambda_tau, dt,
            )
            v_lam = v_lam * scale_l
            ext_work = ext_work + 0.5 * ke2l * (scale_l * scale_l - 1.0)

        # B: half kick
        v = v + (0.5 * dt) * frc.f * inv_m
        if move_lam:
            k1 = self._lam_kick_scale(state.step, 0)
            v_lam = v_lam + (0.5 * dt) * k1 * self._lam_slow_force(
                frc.f_lam, state.lam, state.pH) * inv_ml

        if cfg.thermostat == "langevin" or (
            move_lam and cfg.lambda_thermostat == "langevin"
        ):
            key, k_at, k_lm = jax.random.split(key, 3)

        # A: half drift
        x = x + (0.5 * dt) * v
        if move_lam:
            lam, v_lam = self._lam_drift(lam, v_lam, state.pH, 0.5 * dt,
                                         inv_ml)

        # O: thermostat (Langevin) — full dt OU update. The OU heat
        # (KE after − before) feeds ext_work: h_conserved then tracks the
        # Langevin "effective energy" whose drift measures pure
        # integration error (Leimkuhler–Matthews shadow-work diagnostic)
        if cfg.thermostat == "langevin":
            # heat measured on constraint-projected COPIES (dynamics
            # untouched) — see tiled/engine.py step for why raw ΔKE
            # mis-books kick/noise components the constraints remove
            def _ke_p(v_):
                if self.constraints is not None:
                    v_ = self.constraints.velocities(x, v_, state.box)
                return kinetic_energy(v_, ff.mass)

            ke_o0 = _ke_p(v)
            v = langevin_o_step(k_at, v, ff.mass, cfg.T, cfg.gamma, dt)
            ext_work = ext_work + _ke_p(v) - ke_o0
        if move_lam and cfg.lambda_thermostat == "langevin":
            kel_o0 = lambda_dyn.lambda_kinetic(v_lam, self.spec)
            v_lam = langevin_o_step(
                k_lm, v_lam, self.spec.m_lambda, cfg.T, cfg.lambda_gamma, dt
            )
            ext_work = (ext_work
                        + lambda_dyn.lambda_kinetic(v_lam, self.spec)
                        - kel_o0)

        # A: half drift
        x = x + (0.5 * dt) * v
        if move_lam:
            lam, v_lam = self._lam_drift(lam, v_lam, state.pH, 0.5 * dt,
                                         inv_ml)
            lam, v_lam = self._reflect_lam(lam, v_lam)

        # constraints (rigid water etc.): SHAKE positions onto the manifold
        if self.constraints is not None:
            x, v = self.constraints.positions(state.x, x, v, state.box, dt)

        # force at new positions
        frc_new = self.compute_forces(x, lam, state.box, state.pH, nbr)

        # B: half kick
        v = v + (0.5 * dt) * frc_new.f * inv_m
        if move_lam:
            k2 = self._lam_kick_scale(state.step, 1)
            v_lam = v_lam + (0.5 * dt) * k2 * self._lam_slow_force(
                frc_new.f_lam, lam, state.pH) * inv_ml

        if use_nhc:
            ke2 = 2.0 * kinetic_energy(v, ff.mass)
            scale, nhc_xi = nhc_halfstep(nhc_xi, ke2, ndof, kT, cfg.tau, dt)
            # book the work on constraint-PROJECTED KE: end-of-step
            # RATTLE removes the B-kick's violating components before
            # they reach the tracked energy (projection is linear, so
            # it commutes with the uniform scale; raw ke2 stays the
            # nhc_halfstep input — see the tiled engine's NHC block)
            ke2_p = ke2
            if self.constraints is not None:
                v_p = self.constraints.velocities(x, v, state.box)
                ke2_p = 2.0 * kinetic_energy(v_p, ff.mass)
            v = v * scale
            ext_work = ext_work + 0.5 * ke2_p * (scale * scale - 1.0)
        if move_lam and cfg.lambda_thermostat == "nhc":
            ke2l = 2.0 * lambda_dyn.lambda_kinetic(v_lam, self.spec)
            scale_l, nhc_lam_xi = nhc_halfstep(
                nhc_lam_xi, ke2l, self.n_sites, kT, cfg.lambda_tau, dt,
            )
            v_lam = v_lam * scale_l
            ext_work = ext_work + 0.5 * ke2l * (scale_l * scale_l - 1.0)

        # RATTLE: project constraint-violating velocity components
        if self.constraints is not None:
            v = self.constraints.velocities(x, v, state.box)

        new_state = state.replace(
            x=x, v=v, lam=lam, v_lam=v_lam,
            step=state.step + 1, key=key,
            nhc_xi=nhc_xi, nhc_lam_xi=nhc_lam_xi, ext_work=ext_work,
        )
        return new_state, frc_new

    # -- run loop ---------------------------------------------------------------

    def make_run(self, n_steps: int):
        """Build a jittable run fn: (state, nbr) -> (state, nbr, Observables).

        Structure: outer scan over blocks (neighbor rebuild between blocks),
        inner scan over `rebuild_every` steps (SURVEY.md §2.3.6 — the
        lax.scan timestep clock). n_steps is rounded up to a whole number
        of blocks. At each block boundary the skin-displacement trigger
        (neighbors.needs_rebuild — the LAMMPS `neigh_modify check yes`
        analog) decides whether to rebuild; shapes are static, so the
        lax.cond skips the binning work when no atom moved past skin/2.
        """
        from constant_ph_tpu.neighbors import needs_rebuild

        block = self.cfg.rebuild_every
        n_blocks = -(-n_steps // block)

        def run(state: SystemState, nbr: NeighborList):
            def outer(carry, _):
                state, nbr = carry
                nbr = jax.lax.cond(
                    needs_rebuild(nbr, state.x, state.box, self.nbr_params),
                    lambda: self.build_neighbors(state.x, state.box),
                    lambda: nbr,
                )
                frc = self.compute_forces(
                    state.x, state.lam, state.box, state.pH, nbr
                )

                def inner(c, _):
                    st, fr = c
                    st, fr = self.step(st, fr, nbr)
                    return (st, fr), self.observe(st, fr)

                (state, frc), obs = jax.lax.scan(
                    inner, (state, frc), None, length=block
                )
                return (state, nbr), obs

            (state, nbr), obs = jax.lax.scan(
                outer, (state, nbr), None, length=n_blocks
            )
            # flatten (n_blocks, block, ...) -> (n_steps_padded, ...)
            obs = jax.tree.map(
                lambda a: a.reshape((n_blocks * block,) + a.shape[2:]), obs
            )
            return state, nbr, obs

        return run

    def run(self, state: SystemState, n_steps: int, nbr=None):
        """Convenience: jit-compile and execute a run."""
        if nbr is None:
            nbr = self.build_neighbors(state.x, state.box)
        run_fn = jax.jit(self.make_run(n_steps))
        return run_fn(state, nbr)

    # -- reference-parity diagnostics -----------------------------------------

    def compute_Hs(self, state: SystemState, nbr, groupH_mask):
        """HA/HB via per-atom energy tallies — the reference's observable
        (compute_Hs, fix_constant_pH.cpp:177-280), kept as a
        cross-validation mode (SURVEY.md §7.1). HA = Σ eatom over all
        atoms; HB = Σ eatom over atoms not in the titratable-H group
        (fix_constant_pH.cpp:264-267). The psum-over-mesh equivalent of its
        MPI_Allreduce (fix_constant_pH.cpp:274) happens implicitly when
        sharded."""
        frc = self.compute_forces(state.x, state.lam, state.box, state.pH, nbr)
        HA = jnp.sum(frc.eatom)
        HB = jnp.sum(jnp.where(groupH_mask, 0.0, frc.eatom))
        return HA, HB
