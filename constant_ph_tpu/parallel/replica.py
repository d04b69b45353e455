"""pH replica exchange over a device mesh (BASELINE config 5).

One replica per device (or several per device), batched with vmap and
sharded over a `replica` mesh axis; XLA inserts the (tiny) collectives for
the swap decision over ICI. This is the MD analog of data parallelism
(SURVEY.md §2.4) and the idiomatic TPU replacement for the reference's
replica-level MPI patterns.

Swap move (even/odd alternating neighbor pairs, Metropolis): replicas keep
their configurations and exchange pH values. Because the Hamiltonian's
pH-dependence is purely the f(λ)·kT·ln10·(pK−pH) term per site
(fix_constant_pH.cpp:111), the acceptance exponent reduces exactly to

    β·Δ = ln10 · (pH_i − pH_j) · (F_i − F_j),   F = Σ_sites f(λ_s)

— no energy re-evaluation needed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from constant_ph_tpu import lambda_dyn, units
from constant_ph_tpu.state import SystemState


def _f_sum(lam, bias):
    f, _ = lambda_dyn.switching(lam, bias)
    return jnp.sum(f)


def swap_phs(states: SystemState, key, bias, parity):
    """One even/odd pH-swap sweep over the replica batch (leading axis R).

    parity: 0 swaps pairs (0,1),(2,3),…; 1 swaps (1,2),(3,4),….
    Returns (new_states, accepted_mask).
    """
    R = states.pH.shape[0]
    pH = states.pH
    F = jax.vmap(lambda l: _f_sum(l, bias))(states.lam)

    # neighbor of replica r within its pair for this parity
    idx = jnp.arange(R)
    partner = jnp.where((idx - parity) % 2 == 0, idx + 1, idx - 1)
    partner = jnp.clip(partner, 0, R - 1)
    valid = (partner != idx) & ((partner - parity) >= 0) & (partner < R)

    # β·ΔH for the swap; accept with min(1, exp(−β·ΔH))
    beta_dH = units.LN10 * (pH - pH[partner]) * (F - F[partner])
    # one uniform per PAIR: use the lower index of each pair
    low = jnp.minimum(idx, partner)
    u = jax.random.uniform(key, (R,))
    u_pair = u[low]
    accept = (u_pair < jnp.exp(jnp.minimum(-beta_dH, 0.0))) & valid

    new_pH = jnp.where(accept, pH[partner], pH)
    return states.replace(pH=new_pH), accept


def make_rex_runner(engine, md_steps_per_swap: int):
    """Build a jittable replica-exchange block:
    (states_batched, nbrs_batched, key, parity) ->
        (states, nbrs, key, swap_accept, obs_last)

    vmap over the replica batch; shard the batch axis over a mesh to run
    one replica per chip (see __graft_entry__.dryrun_multichip).
    """
    run = engine.make_run(md_steps_per_swap)

    def block(states, nbrs, key, parity):
        states, nbrs, obs = jax.vmap(run)(states, nbrs)
        key, k_swap = jax.random.split(key)
        states, accepted = swap_phs(states, k_swap, engine.bias, parity)
        last_obs = jax.tree.map(lambda a: a[:, -1], obs)
        return states, nbrs, key, accepted, last_obs

    return block


def stack_replicas(states: list) -> SystemState:
    """Stack per-replica states (SystemState or TiledState) into one batch."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def make_rex_runner_tiled(engine, md_steps_per_swap: int,
                          with_stats: bool = False):
    """Replica-exchange block on the tiled engine:
    (tiled_states_batched, key, parity) -> (states, key, accept, obs_last)
    — or, with ``with_stats=True``,
    (states, key, accept, overflow (R,), stats) where stats is
    {"obs_last": Observables[R], "frac_deprot": (R, S) in-block mean of
    (λ>0.5)} so long drivers can (a) monitor the per-replica capacity /
    dangerous-build flag (vmap precludes in-loop retiling, so callers must
    provision W margin and watch it) and (b) accumulate titration
    statistics from EVERY step of the block rather than the last one.

    Shard the leading replica axis over a mesh for one-replica-per-chip
    execution (BASELINE config 5 over ICI).
    """
    run = engine.make_run(md_steps_per_swap)

    def block(states, key, parity):
        states, overflow, obs = jax.vmap(run)(states)
        key, k_swap = jax.random.split(key)
        states, accepted = swap_phs(states, k_swap, engine.bias, parity)
        last_obs = jax.tree.map(lambda a: a[:, -1], obs)
        if with_stats:
            frac = jnp.mean((obs.lam > 0.5).astype(jnp.float32), axis=1)
            stats = {"obs_last": last_obs, "frac_deprot": frac}
            return states, key, accepted, overflow, stats
        return states, key, accepted, last_obs

    return block


# -- per-replica failure detection (SURVEY.md §5.3) ---------------------------
#
# A single walker in a vmapped replica batch can blow up while the others
# stay healthy (observed at HEWL scale: one metadynamics walker went NaN,
# rebin parked all its waters, and its overflow flag tripped every chunk —
# left alone it silently poisons its own statistics for the rest of the
# run). There is no MPI rank to kill and restart (the reference world's
# recovery, fix_constant_pH.cpp's host aborts the whole job); the TPU-native
# equivalent is a device-side per-replica rollback.


def replica_finite(batch) -> jax.Array:
    """(R,) bool: every floating-point leaf of each replica is finite.

    Jit-safe reduction over the batched pytree (leading axis = replica).
    Cost: one pass over the batch arrays, one (R,) bool to the host.
    """
    cols = []
    for leaf in jax.tree_util.tree_leaves(batch):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            cols.append(jnp.isfinite(leaf).all(
                axis=tuple(range(1, leaf.ndim))))
    return jnp.stack(cols).all(axis=0)


def rollback_replicas(batch, prev, fin: jax.Array, salt: int):
    """Restore non-finite replicas' pre-chunk state; keep healthy ones.

    ``fin`` is replica_finite(batch); where it is False the replica's
    leaves are taken from ``prev`` (its state before the failed chunk) and
    fresh noise is folded into its RNG key so the retry draws a different
    trajectory instead of replaying the blow-up. Pure jnp.where over the
    tree — no host transfer, works on sharded batches.
    """
    def sel(new, old):
        m = fin.reshape(fin.shape + (1,) * (new.ndim - 1))
        return jnp.where(m, new, old)
    merged = jax.tree_util.tree_map(sel, batch, prev)
    rekey = jax.vmap(lambda k: jax.random.fold_in(k, 7919 + salt))(merged.key)
    # reshape the mask like `sel` does — works for both old-style (R, 2)
    # uint32 keys and new-style typed keys of shape (R,)
    m = fin.reshape(fin.shape + (1,) * (merged.key.ndim - 1))
    return merged.replace(key=jnp.where(m, merged.key, rekey))


def replica_healthy(batch, lam_min: float = -0.1, lam_max: float = 1.1,
                    v_lam_max: float = 0.5,
                    v_atom_max: float = 5.0) -> jax.Array:
    """(R,) bool: finite AND the λ AND atom subsystems are physically sane.

    Finiteness alone is not health: the round-4 stage-2 campaign carried
    a corrupt-but-finite walker for ~50 chunks (λ outside the reflective
    walls at 1.49, |v_λ| = 1.55 λ/fs ≈ 60× thermal, atom velocities at
    5e9 Å/fs, ext_work −1e23 — all finite, so replica_finite never fired
    and the rollback guard kept "recovering" to the corrupt state). A
    walker whose λ sits outside [lam_min, lam_max], whose |v_λ| exceeds
    `v_lam_max` (thermal v_λ for m_λ=20 is ~0.025 λ/fs; 0.5 is 20×
    that), or whose atom speeds exceed `v_atom_max` Å/fs (thermal is
    ~0.01; parked tile slots carry v = 0 so they never trip this) is
    doomed statistics even while finite — roll it back like a NaN.
    """
    fin = replica_finite(batch)
    lam_ok = ((batch.lam >= lam_min) & (batch.lam <= lam_max)).all(axis=1)
    v_ok = (jnp.abs(batch.v_lam) <= v_lam_max).all(axis=1)
    R = batch.lam.shape[0]
    wv_ok = (jnp.abs(batch.wv.reshape(R, -1)) <= v_atom_max).all(axis=1)
    sv_ok = (jnp.abs(batch.sv.reshape(R, -1)) <= v_atom_max).all(axis=1)
    return fin & lam_ok & v_ok & wv_ok & sv_ok
