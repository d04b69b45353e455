"""Well-tempered metadynamics on the λ coordinates (enhanced sampling).

Why this exists: at full Δq coupling, λ barrier crossings at HEWL scale
are Marcus-limited by solvent reorganization — flip times reach 10-100 ps
near pH = pK, so plain λ-dynamics / pH-REX titration curves need O(10)
chip-hours per point to converge (measured round 2,
examples/results/titration_rex_multisite_fullq_v5e.json: per-class
midpoints exact, near-pK rungs metastable). A history-dependent bias on λ
actively drives crossings AND yields the per-site deprotonation free
energy directly from the deposited bias, replacing slow flip-counting
statistics with a free-energy estimator.

Scheme (per titratable site s, independent 1-D well-tempered hills — the
standard treatment when biasing many weakly-coupled CVs; inter-site
coupling still enters through the physical dynamics):

  V_s(λ) ← V_s(λ) + h0·exp(−V_s(λ_s)/((γ−1)kT)) · exp(−(λ−λ_s)²/2σ²)
  F_s(λ) = −γ/(γ−1) · V_s(λ)            (well-tempered estimator)
  x_deprot(s) = ∫_{λ>1/2} e^{−βF_s} / ∫ e^{−βF_s}

The bias rides on a fixed λ grid as (V, dV/dλ) value tables — both are
updated ANALYTICALLY on deposit (the hill and its derivative are closed
forms), so the in-step bias force is a smooth linear interpolation, all
fixed-shape device math (no data-dependent shapes; deposits happen at
scan-block boundaries inside jit).

Everything here extends the reference's physics scope: the reference fix
integrates plain λ-dynamics only (fix_constant_pH.cpp:109-117); enhanced
λ sampling is the capability its titration purpose (fix_constant_pH.cpp:111)
needs at production scale.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import units


@struct.dataclass
class MetadParams:
    """Static metadynamics configuration (compiled into the step)."""

    lo: float = struct.field(pytree_node=False, default=-0.1)
    hi: float = struct.field(pytree_node=False, default=1.1)
    nbins: int = struct.field(pytree_node=False, default=121)
    sigma: float = struct.field(pytree_node=False, default=0.05)
    # initial hill height (kcal/mol); the WT factor damps it as V grows
    h0: float = struct.field(pytree_node=False, default=0.1)
    # well-tempered bias factor γ > 1: V converges to (1−1/γ)·F, hills
    # decay as exp(−V/((γ−1)kT)); γ→∞ recovers standard metadynamics.
    # SIZE γ TO THE BARRIER: the fill effectively stalls once V reaches
    # a few ×(γ−1)kT, so crossing needs γ ≳ 1 + F_barrier/kT — the bare
    # Donnini landscape (~6.5 kcal) works at γ 8-15, full-Δq landscapes
    # (+ Marcus solvent term, 12-20 kcal total) need γ ~ 25-40
    # (measured round 3: γ=12 never crossed at full Δq)
    gamma: float = struct.field(pytree_node=False, default=8.0)
    T: float = struct.field(pytree_node=False, default=300.0)
    # deposit one hill whenever an engine block boundary crosses a
    # multiple of this many MD steps (pace τ = stride·dt). The pace must
    # stay SLOW vs the λ relaxation time (λ period ≈ 20 fs for m_λ=20 in
    # the Donnini wells): measured on the default landscape, a hill per
    # 5 fs left walker-to-walker basin-ΔF scatter of several kT, a hill
    # per 50 fs converges to ≲0.5 kT (tests/test_metad.py)
    stride: int = struct.field(pytree_node=False, default=100)

    @property
    def dx(self) -> float:
        return (self.hi - self.lo) / (self.nbins - 1)

    def grid(self):
        return jnp.linspace(self.lo, self.hi, self.nbins)


def init_tables(n_sites: int, p: MetadParams, dtype=jnp.float32):
    """Zeroed (V, dV) bias tables, shape (S, nbins) each."""
    z = jnp.zeros((n_sites, p.nbins), dtype=dtype)
    return z, z


def lookup(V, dV, lam, p: MetadParams):
    """Linear-interpolated (V_s(λ_s), dV_s/dλ(λ_s)) per site.

    λ outside [lo, hi] clamps to the edge value with ZERO slope. The
    zero slope is load-bearing, not a nicety: after a long fill the
    table's edge bins carry steep hill flanks, and clamping to the edge
    DERIVATIVE hands an escaped walker a constant outward force. The
    Donnini erf walls saturate outside the λ window (no restoring
    force), so that outward pull sustains a Langevin terminal velocity
    f/(γ_λ·m_λ) ≈ 1.6 λ/fs — fast enough to overshoot both reflective
    walls every half-drift. Root cause of the round-3/4 campaigns'
    recurring corrupt-but-finite walkers (stage-2 final checkpoint,
    replica 4: λ=1.49, |v_λ|=1.55, ext_work −1e23; round-5 nandump)."""
    u = (lam - p.lo) / p.dx
    i0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, p.nbins - 2)
    f = jnp.clip(u - i0.astype(lam.dtype), 0.0, 1.0)
    take = lambda A, i: jnp.take_along_axis(A, i[:, None], axis=1)[:, 0]
    v = take(V, i0) * (1.0 - f) + take(V, i0 + 1) * f
    dv = take(dV, i0) * (1.0 - f) + take(dV, i0 + 1) * f
    inside = (lam >= p.lo) & (lam <= p.hi)
    return v, jnp.where(inside, dv, 0.0)


def deposit(V, dV, lam, p: MetadParams):
    """One well-tempered hill per site at its current λ (analytic V and
    dV/dλ updates — keeps the force table exactly the derivative of the
    energy table, so the in-step bias force is conservative between
    deposits)."""
    kT = units.BOLTZ * p.T
    v_at, _ = lookup(V, dV, lam, p)
    h = p.h0 * jnp.exp(-v_at / ((p.gamma - 1.0) * kT))       # (S,)
    x = p.grid()[None, :] - lam[:, None]                     # (S, B)
    g = jnp.exp(-(x * x) / (2.0 * p.sigma * p.sigma))
    return (V + h[:, None] * g,
            dV + h[:, None] * (-x / (p.sigma * p.sigma)) * g)


def deposit_many(V, dV, lam_seq, p: MetadParams):
    """Deposit a time-ordered SEQUENCE of hills (K, S) into shared tables.

    Multiple-walkers metadynamics: walkers sampling the same ensemble
    share one bias; each contributes hills at its own λ. The standard
    delayed-bias scheme runs walkers against a bias frozen for a chunk,
    then merges every walker's hill sequence — this is that merge, with
    the well-tempered height of each hill computed against the
    PROGRESSIVELY updated table (exactly what in-run deposits would do,
    up to the intra-chunk lag). jit/scan-based, fixed shapes."""

    def body(tabs, lam):
        return deposit(tabs[0], tabs[1], lam, p), None

    (V, dV), _ = jax.lax.scan(body, (V, dV), lam_seq)
    return V, dV


def free_energy(V, p: MetadParams):
    """Well-tempered free-energy estimate F_s(λ) = −γ/(γ−1)·V_s(λ),
    shifted so min F = 0 per site."""
    F = -(p.gamma / (p.gamma - 1.0)) * V
    return F - jnp.min(F, axis=1, keepdims=True)


def _basin_logZ(V, p: MetadParams):
    """Per-site log basin partition sums (log Σ_dep w, log Σ_prot w) of
    F_s(λ) split at λ = 1/2 (trapezoid on the grid), computed in LOG
    space: the naive exp(−F/kT) ratio overflows f32 once the WT fill
    exceeds ~50 kcal, and the old ±(1−1e-12) clip rounds to exactly 1.0
    in f32, which is how round-4's calibrator cross-check leaked −inf
    on 13/20 sites (results/dg_crosscheck_metad_v5e.json)."""
    return _basin_logZ_F(free_energy(V, p), p)


def _basin_logZ_F(F, p: MetadParams):
    """_basin_logZ on an explicit free-energy profile F (…, nbins) —
    the shared body for both the per-walker estimator (F from one V
    table) and the pooled estimator (F assembled from many tables plus
    the analytic pH term)."""
    kT = units.BOLTZ * p.T
    # trapezoid weights (uniform grid): half at the ends
    tw = jnp.ones((p.nbins,), F.dtype).at[0].set(0.5).at[-1].set(0.5)
    logw = -F / kT + jnp.log(tw)
    dep = p.grid() > 0.5
    neg = jnp.asarray(-jnp.inf, F.dtype)
    lz_dep = jax.scipy.special.logsumexp(
        jnp.where(dep, logw, neg), axis=-1)
    lz_prot = jax.scipy.special.logsumexp(
        jnp.where(dep, neg, logw), axis=-1)
    return lz_dep, lz_prot


def deprotonated_fraction(V, p: MetadParams):
    """Per-site ⟨deprotonated⟩ from the bias profile: basin-integrated
    Boltzmann weights of F_s(λ) split at λ = 1/2 (trapezoid on the grid).
    This is the metadynamics titration estimator — it needs converged V,
    not converged barrier-crossing statistics."""
    lz_dep, lz_prot = _basin_logZ(V, p)
    return jax.nn.sigmoid(lz_dep - lz_prot)


def delta_f_sites(V, p: MetadParams):
    """Per-site deprotonation free energy ΔF_s = −kT·ln(x/(1−x)) from the
    basin populations (kcal/mol; negative ⇒ deprotonated favored).
    Always finite for finite V (log-space basin sums, _basin_logZ)."""
    kT = units.BOLTZ * p.T
    lz_dep, lz_prot = _basin_logZ(V, p)
    return -kT * (lz_dep - lz_prot)


def pooled_intrinsic_profile(V, pK, pH, p: MetadParams,
                             switch_slope: float = 50.0):
    """Minimum-variance intrinsic free-energy profiles F0_s(λ), pooled
    across pH walkers (Rao–Blackwellization over the analytic pH term).

    The simulated landscape at a walker's pH differs from the intrinsic
    (pH-independent) profile F0_s(λ) by EXACTLY the analytic driving
    term kT·ln10·(pK_s − pH)·f(λ) (lambda_dyn.switching; ref
    fix_constant_pH.cpp:111) — nothing else in the Hamiltonian depends
    on pH. Every pH walker's well-tempered table is therefore an
    independent estimate of the SAME F0_s up to that known term and an
    arbitrary per-walker constant (which cancels in basin differences),
    so the minimum-variance estimator subtracts the term and averages
    the profiles: per-point noise drops ~√G and the per-(site, pH)
    curve points stop being independently noisy. Measured on the
    round-5 stage-3 checkpoint: per-site curve mad 0.191 → 0.113 and
    every pooled curve became monotonic, exposing the residual as one
    clean global ΔG_ref offset (class spread ±0.07 kcal) instead of
    ±1.3 kcal per-point scatter.

    V: (G, S, nbins) per-pH-group tables (walkers at the same pH share
    one merged table — pass one table per pH group). pK: (S,), pH: (G,).
    switch_slope must match the installed BiasParams.switch_slope.
    Returns F0: (S, nbins), min-shifted per site.
    """
    kT = units.BOLTZ * p.T
    f_lam = jax.nn.sigmoid(switch_slope * (p.grid() - 0.5))   # (B,)
    F = -(p.gamma / (p.gamma - 1.0)) * V                      # (G,S,B)
    drive = kT * jnp.log(10.0) * (pK[None, :] - pH[:, None])  # (G,S)
    F0 = F - drive[:, :, None] * f_lam[None, None, :]
    F0 = F0 - jnp.min(F0, axis=2, keepdims=True)
    F0 = jnp.mean(F0, axis=0)
    return F0 - jnp.min(F0, axis=1, keepdims=True)


def fraction_at_ph(F0, pK, pH, p: MetadParams,
                   switch_slope: float = 50.0):
    """Deprotonated fraction at an arbitrary pH from pooled intrinsic
    profiles: basin-integrate F0_s(λ) + kT·ln10·(pK_s − pH)·f(λ). The
    inverse of the subtraction in pooled_intrinsic_profile, so for
    noise-free tables this reproduces deprotonated_fraction of the
    original landscape exactly (tests/test_metad.py). F0: (S, nbins);
    pH: scalar. Returns (S,)."""
    kT = units.BOLTZ * p.T
    f_lam = jax.nn.sigmoid(switch_slope * (p.grid() - 0.5))
    drive = kT * jnp.log(10.0) * (pK - pH)[:, None] * f_lam[None, :]
    lz_dep, lz_prot = _basin_logZ_F(F0 + drive, p)
    return jax.nn.sigmoid(lz_dep - lz_prot)


def retilt_profile(F0, dG_ref_from, dG_ref_to, p: MetadParams,
                   switch_slope: float = 50.0):
    """Evaluate intrinsic profiles at a DIFFERENT ΔG_ref, analytically.

    ΔG_ref enters the λ Hamiltonian only through the linear term
    −ΔG_ref·f(λ) (lambda_dyn.ph_energy; ref fix_constant_pH.cpp:111),
    so a landscape converged while simulating at `dG_ref_from` IS the
    landscape at `dG_ref_to` plus the known tilt
    (dG_ref_from − dG_ref_to)·f(λ) — no re-run required. This is how a
    calibration correction (global or per-class) is applied to an
    already-converged campaign checkpoint: metadynamics converges to
    the same free-energy estimate whatever the tilt, so re-running at
    the corrected constant only changes sampling efficiency, never the
    converged answer.

    F0: (S, nbins) from pooled_intrinsic_profile (which was fed tables
    simulated at dG_ref_from). dG_ref_from/to: scalars or (S,).
    Returns the retilted (S, nbins) profiles, min-shifted per site.
    """
    f_lam = jax.nn.sigmoid(switch_slope * (p.grid() - 0.5))
    delta = jnp.asarray(dG_ref_from) - jnp.asarray(dG_ref_to)
    delta = jnp.broadcast_to(jnp.atleast_1d(delta), (F0.shape[0],))
    F = F0 + delta[:, None] * f_lam[None, :]
    return F - jnp.min(F, axis=1, keepdims=True)


def pooled_delta_f(F0, p: MetadParams):
    """Intrinsic basin ΔF_s (dep − prot, kcal/mol) of pooled profiles.
    Under a correctly calibrated ΔG_ref this is 0 for every site (the
    pK is already carried by the analytic driving term), so the mean
    over sites IS the fixed-point ΔG_ref correction — the pooled
    version of metad_vtable_residual.py's median."""
    kT = units.BOLTZ * p.T
    lz_dep, lz_prot = _basin_logZ_F(F0, p)
    return -kT * (lz_dep - lz_prot)


def deposit_frozen(V, dV, lam_seq, p: MetadParams):
    """Hill DELTAS against a frozen base table (vectorized over hills).

    lam_seq: (K, S) hill positions. All well-tempered heights are
    computed against the FROZEN (V, dV) — the standard delayed-bias
    treatment for multiple-walkers metadynamics, where walkers run a
    chunk against a fixed bias and their hills merge afterwards. Returns
    (ΔV, ΔdV) with the same (S, nbins) shape as the tables; deltas from
    different walkers are additive and order-free, which is what makes
    the cross-device psum merge exact (unlike the progressive
    deposit_many, where each hill's height sees earlier hills)."""
    kT = units.BOLTZ * p.T
    v_at = jax.vmap(lambda lam: lookup(V, dV, lam, p)[0])(lam_seq)  # (K,S)
    h = p.h0 * jnp.exp(-v_at / ((p.gamma - 1.0) * kT))              # (K,S)
    x = p.grid()[None, None, :] - lam_seq[:, :, None]               # (K,S,B)
    g = jnp.exp(-(x * x) / (2.0 * p.sigma * p.sigma))
    dVt = jnp.sum(h[:, :, None] * g, axis=0)
    ddVt = jnp.sum(h[:, :, None] * (-x / (p.sigma * p.sigma)) * g, axis=0)
    return dVt, ddVt


def make_mesh_walker_merge(mesh, axis: str, p: MetadParams):
    """Cross-device multiple-walkers hill merge: shard_map + psum.

    Returns merge(V, dV, lam_seq_sharded) where (V, dV) are the shared
    (S, nbins) tables REPLICATED over `axis` and lam_seq is (W, K, S)
    SHARDED over `axis` (one or more walkers per device). Each device
    computes its walkers' hill deltas against the frozen shared table
    (deposit_frozen) and the deltas are summed across the mesh with
    `jax.lax.psum` — the direct analog of the reference's
    MPI_Allreduce-based sharing (fix_constant_pH.cpp:274), here carrying
    bias increments between same-pH walkers on different chips
    (docs/ROADMAP.md round-3 candidate 4). Exact: frozen-base deltas are
    order-free, so the psum merge equals the serial frozen-base merge
    bit-for-bit up to float addition order.

    Implemented as the G = 1 case of make_mesh_group_merge (one shared
    body to keep in sync — advisor finding, round 4)."""
    grp = make_mesh_group_merge(mesh, axis, p)

    def merge(V, dV, seq):
        Vn, dVn = grp(V[None], dV[None], seq[None])
        return Vn[0], dVn[0]

    return merge


def make_mesh_group_merge(mesh, axis: str, p: MetadParams):
    """Batched variant of make_mesh_walker_merge for G pH groups at once.

    Returns merge(V, dV, seq) where V/dV are (G, S, nbins) shared tables
    REPLICATED over `axis` and seq is (G, W, K, S) per-walker λ snapshots
    with the WALKER axis sharded over `axis` (W % mesh size == 0). One
    shard_map call → one psum pair per chunk for ALL pH groups (the
    campaign driver's MPI_Allreduce analog, fix_constant_pH.cpp:274),
    instead of G sequential collectives. Frozen-base deltas are order-free,
    so the result equals the serial deposit_frozen merge up to float
    addition order."""
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map          # JAX >= 0.8 home
    except ImportError:                    # older JAX
        from jax.experimental.shard_map import shard_map

    def _local(V, dV, seq):
        # V/dV: (G, S, nbins); seq: (G, W_local, K, S)
        def fold(Vg, dVg, sg):
            flat = sg.reshape(-1, sg.shape[-1])
            return deposit_frozen(Vg, dVg, flat, p)

        dVt, ddVt = jax.vmap(fold)(V, dV, seq)
        dVt = jax.lax.psum(dVt, axis)
        ddVt = jax.lax.psum(ddVt, axis)
        return V + dVt, dV + ddVt

    return shard_map(
        _local, mesh=mesh,
        in_specs=(P(), P(), P(None, axis)),
        out_specs=(P(), P()),
    )
