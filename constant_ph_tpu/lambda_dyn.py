"""λ-dynamics: the constant-pH physics module.

Implements the intended physics of the reference fix (with the SURVEY.md §8
derivative/sign corrections applied):

- switching function f(λ) and df/dλ          (ref: fix_constant_pH.cpp:120-124)
- Donnini–Ullmann bias potential U(λ), dU/dλ (ref: fix_constant_pH.cpp:128-145,
  constants fix_constant_pH.cpp:85-96, Donnini & Ullmann JCTC 2016 Table S2)
- pH driving free energy f(λ)·R·T·ln10·(pK−pH) (ref: fix_constant_pH.cpp:111)
- per-atom charge interpolation q(λ) between protonated (λ=0) and
  deprotonated (λ=1) charge sets, with buffer-atom charge compensation — the
  scheme the reference author states is the correct one
  (fix_constant_pH.cpp:156-161) and the `modify_water` intent
  (fix_constant_pH.h:58, fix_constant_pH.cpp:42-46, 268)
- exact dU_ff/dλ = Σ_i φ_i · dq_i/dλ where φ_i = ∂U_elec/∂q_i is the
  electrostatic potential at atom i (replaces the reference's approximate
  HB−HA per-atom-energy differencing, fix_constant_pH.cpp:111, 264-267)
- λ velocity-Verlet integration with dt_λ = nevery·dt
  (ref: fix_constant_pH.cpp:109-117)
- the conserved-quantity observable H_λ (ref: fix_constant_pH.cpp:114)

Everything is a pure function over jnp arrays; multi-site λ is a first-class
vector (the reference holds a single scalar λ — multi-site is the BASELINE
config-2/4 extension).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import units


@struct.dataclass
class BiasParams:
    """Donnini–Ullmann bias-potential constants (fix_constant_pH.cpp:86-96).

    All static Python floats (they parameterize the compiled program). Energy
    constants are in kcal/mol; λ is dimensionless. ``switch_slope`` is the 50
    in the reference's sigmoid (fix_constant_pH.cpp:122).
    """

    w: float = struct.field(pytree_node=False, default=200.0)
    s: float = struct.field(pytree_node=False, default=0.3)
    k: float = struct.field(pytree_node=False, default=2.533)
    a: float = struct.field(pytree_node=False, default=0.034041)
    b: float = struct.field(pytree_node=False, default=0.005238)
    r: float = struct.field(pytree_node=False, default=16.458)
    m: float = struct.field(pytree_node=False, default=0.1507)
    d: float = struct.field(pytree_node=False, default=2.0)
    # `h` is assigned-but-unused in the reference (fix_constant_pH.cpp:88,
    # SURVEY.md §8 bug 4); kept for config parity, not used in U(λ).
    h: float = struct.field(pytree_node=False, default=4.0)
    switch_slope: float = struct.field(pytree_node=False, default=50.0)


def switching(lam: jax.Array, p: BiasParams) -> tuple[jax.Array, jax.Array]:
    """f(λ) = 1/(1+exp(−slope·(λ−1/2))) and its corrected derivative.

    The reference's df is wrong (divides by f² instead of multiplying,
    SURVEY.md §8 bug 6); the correct form is df = slope·f·(1−f).
    """
    f = jax.nn.sigmoid(p.switch_slope * (lam - 0.5))
    df = p.switch_slope * f * (1.0 - f)
    return f, df


def bias(lam: jax.Array, p: BiasParams) -> tuple[jax.Array, jax.Array]:
    """Bias potential U(λ) and analytic dU/dλ (element-wise over sites).

    Five terms (fix_constant_pH.cpp:132-141): two Gaussian end-state wells at
    λ≈0 and λ≈1, a central Gaussian barrier, and two erf outer walls that
    confine λ to ≈[0, 1]. Derivatives use the corrected chain rule
    (SURVEY.md §8 bugs 8-9: the wells' d/dλ brings down −x/a², and the U4
    wall derivative uses (λ+m), not (λ+0.5)).
    """
    a2 = p.a * p.a
    s2 = p.s * p.s
    sqrt_pi = jnp.sqrt(jnp.pi)

    x1 = lam - 1.0 - p.b
    x2 = lam + p.b
    x3 = lam - 0.5
    u1 = -p.k * jnp.exp(-x1 * x1 / (2.0 * a2))
    u2 = -p.k * jnp.exp(-x2 * x2 / (2.0 * a2))
    u3 = p.d * jnp.exp(-x3 * x3 / (2.0 * s2))
    u4 = 0.5 * p.w * (1.0 - jax.scipy.special.erf(p.r * (lam + p.m)))
    u5 = 0.5 * p.w * (1.0 + jax.scipy.special.erf(p.r * (lam - 1.0 - p.m)))

    du1 = -(x1 / a2) * u1
    du2 = -(x2 / a2) * u2
    du3 = -(x3 / s2) * u3
    du4 = -0.5 * p.w * p.r * (2.0 / sqrt_pi) * jnp.exp(
        -(p.r * (lam + p.m)) ** 2
    )
    du5 = 0.5 * p.w * p.r * (2.0 / sqrt_pi) * jnp.exp(
        -(p.r * (lam - 1.0 - p.m)) ** 2
    )

    U = u1 + u2 + u3 + u4 + u5
    dU = du1 + du2 + du3 + du4 + du5
    return U, dU


@struct.dataclass
class LambdaSpec:
    """Static description of the titratable sites (the λ "site table").

    Shapes: S = number of sites, P = padded atoms-per-site capacity.
    Each site lists the atoms whose charge changes on deprotonation —
    including its charge-compensation buffer atoms (the `modify_water`
    scheme, fix_constant_pH.h:58): dq over a site sums to ~0 so the cell
    stays neutral for Ewald at every λ.
    """

    pK: jax.Array          # (S,) site reference pKa (ref arg, fix_constant_pH.cpp:47)
    dG_ref: jax.Array      # (S,) force-field reference deprotonation ΔG (kcal/mol);
                           # calibration offset standard in constant-pH MD (0 ⇒ pure
                           # reference behavior, which has no such term)
    m_lambda: jax.Array    # (S,) fictitious λ mass, (g/mol)·Å² (ref: 20 u,
                           # fix_constant_pH.cpp:96)
    atom_idx: jax.Array    # (S, P) int32 indices into the atom arrays; padded rows
                           # point at index 0 with mask 0
    dq: jax.Array          # (S, P) q_B − q_A per listed atom (e)
    atom_mask: jax.Array   # (S, P) 1.0 for real entries, 0.0 for padding

    @property
    def n_sites(self) -> int:
        return self.pK.shape[0]


def make_single_site(
    atom_idx,
    q_prot,
    q_deprot,
    pK: float,
    *,
    buffer_idx=None,
    m_lambda: float = 20.0,
    dG_ref: float = 0.0,
    dtype=jnp.float32,
) -> LambdaSpec:
    """Build a one-site LambdaSpec (the reference's exact scope: one scalar λ).

    ``buffer_idx`` (optional) lists charge-buffer atoms (the reference's
    3-atom water group, fix_constant_pH.cpp:42-46); the net site charge
    change −Σdq is spread equally over them so Σ_i dq_i = 0.
    """
    import numpy as np

    atom_idx = np.asarray(atom_idx, dtype=np.int32)
    dq = np.asarray(q_deprot, dtype=np.float64) - np.asarray(q_prot, np.float64)
    if buffer_idx is not None:
        buffer_idx = np.asarray(buffer_idx, dtype=np.int32)
        comp = -dq.sum() / buffer_idx.shape[0]
        atom_idx = np.concatenate([atom_idx, buffer_idx])
        dq = np.concatenate([dq, np.full(buffer_idx.shape[0], comp)])
    P = atom_idx.shape[0]
    return LambdaSpec(
        pK=jnp.array([pK], dtype=dtype),
        dG_ref=jnp.array([dG_ref], dtype=dtype),
        m_lambda=jnp.array([m_lambda], dtype=dtype),
        atom_idx=jnp.asarray(atom_idx).reshape(1, P),
        dq=jnp.asarray(dq, dtype=dtype).reshape(1, P),
        atom_mask=jnp.ones((1, P), dtype=dtype),
    )


def stack_sites(specs: list[LambdaSpec]) -> LambdaSpec:
    """Stack single-site specs into one multi-site table (pads P to the max)."""
    import numpy as np

    P = max(int(s.atom_idx.shape[1]) for s in specs)

    def pad2(x, fill):
        x = np.asarray(x)
        out = np.full((x.shape[0], P), fill, dtype=x.dtype)
        out[:, : x.shape[1]] = x
        return out

    return LambdaSpec(
        pK=jnp.concatenate([s.pK for s in specs]),
        dG_ref=jnp.concatenate([s.dG_ref for s in specs]),
        m_lambda=jnp.concatenate([s.m_lambda for s in specs]),
        atom_idx=jnp.asarray(
            np.concatenate([pad2(s.atom_idx, 0) for s in specs], axis=0)
        ),
        dq=jnp.asarray(np.concatenate([pad2(s.dq, 0.0) for s in specs], axis=0)),
        atom_mask=jnp.asarray(
            np.concatenate([pad2(s.atom_mask, 0.0) for s in specs], axis=0)
        ),
    )


def charges(q0: jax.Array, spec: LambdaSpec, lam: jax.Array) -> jax.Array:
    """q(λ): per-atom charges at the current λ vector.

    q_i = q0_i + Σ_s λ_s · dq_{s,i} — linear interpolation between the
    protonated (λ=0) and deprotonated (λ=1) charge sets, exactly the
    "modify the force-field parameters before the force evaluation" scheme
    of fix_constant_pH.cpp:156-161. q0 is the all-protonated charge vector.
    """
    contrib = (lam[:, None] * spec.dq * spec.atom_mask).reshape(-1)
    idx = spec.atom_idx.reshape(-1)
    return q0.at[idx].add(contrib.astype(q0.dtype))


def dq_dlambda_dot(spec: LambdaSpec, phi: jax.Array) -> jax.Array:
    """Exact electrostatic dU/dλ_s = Σ_i φ_i · dq_i/dλ_s per site.

    φ must be ∂U_elec/∂q_i (the electrostatic potential at atom i, including
    real-space, reciprocal-space, self and exclusion corrections). Replaces
    the reference's HB−HA eatom differencing (fix_constant_pH.cpp:264-277),
    which its author flagged as broken (SURVEY.md §8 bugs 16-17).
    """
    phi_at = phi[spec.atom_idx]          # (S, P)
    return jnp.sum(phi_at * spec.dq * spec.atom_mask, axis=-1)


def ph_energy(
    lam: jax.Array, spec: LambdaSpec, pH: jax.Array, T: float, p: BiasParams
) -> tuple[jax.Array, jax.Array]:
    """pH driving free energy per site and its λ-derivative.

    V_pH(λ) = f(λ)·[kT·ln10·(pK−pH) − ΔG_ref]   (ref: fix_constant_pH.cpp:111,
    the f/df pairing of fix_constant_pH.cpp:114 kept exactly consistent so
    that F_λ = −∂H/∂λ holds and H_λ is conserved — SURVEY.md §8 bug 18).
    """
    f, df = switching(lam, p)
    scale = units.BOLTZ * T * units.LN10 * (spec.pK - pH) - spec.dG_ref
    return f * scale, df * scale


def lambda_force(
    lam: jax.Array,
    dU_elec_dlam: jax.Array,
    spec: LambdaSpec,
    pH: jax.Array,
    T: float,
    p: BiasParams,
) -> tuple[jax.Array, jax.Array]:
    """F_λ = −∂H/∂λ per site; also returns the site potential energy.

    Mirrors fix_constant_pH.cpp:111 with HB−HA replaced by the exact
    dU_elec/dλ (SURVEY.md §3.5).
    """
    U_ph, dU_ph = ph_energy(lam, spec, pH, T, p)
    U_bias, dU_bias = bias(lam, p)
    force = -(dU_elec_dlam + dU_ph + dU_bias)
    return force, U_ph + U_bias


def analytic_lambda_force(
    lam: jax.Array, spec: LambdaSpec, pH: jax.Array, T: float, p: BiasParams
) -> jax.Array:
    """The ANALYTIC (closed-form-in-λ) part of F_λ: −(dU_pH + dU_bias).

    This is the stiff part of the λ landscape — measured curvature on
    the solvated-acid system: 2.4e3 kcal/mol in the Donnini end-state
    wells (period 28 fs) and 2.4e4 kcal/mol in the erf walls (period
    8.9 fs), vs ≲2e2 for the electrostatic φ·dq term. At dt = 2 fs the
    walls are 4.5 steps/period — far beyond Verlet stability, which is
    how an uncalibrated (strongly tilted) landscape pumps λ kinetic
    energy without bound (the round-5 λ-live PME NVE blowup,
    examples/results/nve_drift_pme_k1_v5e.json). The integrator
    therefore sub-steps λ against THIS force (λ-RESPA, cfg.lambda_inner)
    while the expensive slowly-varying φ·dq (+ metadynamics) part stays
    on the outer step as an impulse — the same Verlet-I split already
    used for k-space (ref fix_constant_pH.cpp:69,113 MTS semantics).
    """
    _, dU_ph = ph_energy(lam, spec, pH, T, p)
    _, dU_bias = bias(lam, p)
    return -(dU_ph + dU_bias)


def lambda_kinetic(v_lambda: jax.Array, spec: LambdaSpec) -> jax.Array:
    """Σ ½ m_λ v_λ² in kcal/mol (v_λ in 1/fs, m_λ in (g/mol)·Å²)."""
    return 0.5 * units.MVV2E * jnp.sum(spec.m_lambda * v_lambda * v_lambda)


def lambda_temperature(v_lambda: jax.Array, spec: LambdaSpec) -> jax.Array:
    """Instantaneous λ temperature: ⟨m v²⟩/kB per degree of freedom."""
    ke = lambda_kinetic(v_lambda, spec)
    ndof = spec.n_sites
    return 2.0 * ke / (ndof * units.BOLTZ)
