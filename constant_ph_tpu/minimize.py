"""Energy minimization (FIRE) — the `minimize` engine service.

The reference's host engine provides minimization before dynamics; our
builders produce lattice-packed solvent with incidental clashes, so a
jitted FIRE relaxation is the standard preamble before NVE/NVT runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from constant_ph_tpu import units


def fire_minimize(
    engine,
    state,
    n_steps: int = 200,
    *,
    dt_start: float = 0.5,
    dt_max: float = 2.0,
    f_inc: float = 1.1,
    f_dec: float = 0.5,
    alpha_start: float = 0.1,
    f_alpha: float = 0.99,
    n_min: int = 5,
    max_move: float = 0.1,
):
    """FIRE minimization of atomic positions (λ held fixed).

    Rebuilds neighbors every `engine.cfg.rebuild_every` steps like the MD
    loop. Displacements are capped at `max_move` Å/step for robustness in
    badly clashed starts. Returns the relaxed state.
    """
    cfg = engine.cfg
    block = cfg.rebuild_every
    n_blocks = -(-n_steps // block)
    inv_m = units.FTM2V / engine.ff.mass[:, None]

    def fire_step(carry, _):
        x, v, dt, alpha, n_pos, nbr, lam, box, pH = carry
        frc = engine.compute_forces(x, lam, box, pH, nbr)
        f = frc.f
        # velocity Verlet kick-drift with FIRE velocity mixing
        v = v + dt * f * inv_m
        power = jnp.sum(f * v)
        f_norm = jnp.sqrt(jnp.sum(f * f) + 1e-20)
        v_norm = jnp.sqrt(jnp.sum(v * v) + 1e-20)
        v_mixed = (1.0 - alpha) * v + alpha * f * (v_norm / f_norm)
        uphill = power < 0.0
        v = jnp.where(uphill, jnp.zeros_like(v), v_mixed)
        n_pos = jnp.where(uphill, 0, n_pos + 1)
        grow = (n_pos > n_min) & ~uphill
        dt = jnp.where(grow, jnp.minimum(dt * f_inc, dt_max),
                       jnp.where(uphill, dt * f_dec, dt))
        alpha = jnp.where(grow, alpha * f_alpha,
                          jnp.where(uphill, alpha_start, alpha))
        dx = dt * v
        step_len = jnp.sqrt(jnp.sum(dx * dx, axis=-1, keepdims=True))
        dx = dx * jnp.minimum(1.0, max_move / (step_len + 1e-12))
        x_new = x + dx
        # keep rigid molecules on the constraint manifold at every move —
        # otherwise a constrained H (no LJ core) can dive into a neighbor's
        # Coulomb well during minimization
        if engine.constraints is not None:
            x_new, _ = engine.constraints.positions(
                x, x_new, jnp.zeros_like(v), box, 1.0
            )
        x = x_new
        return (x, v, dt, alpha, n_pos, nbr, lam, box, pH), frc.e_pot

    def block_fn(carry, _):
        x, v, dt, alpha, n_pos, lam, box, pH = carry
        nbr = engine.build_neighbors(x, box)
        (x, v, dt, alpha, n_pos, _, _, _, _), e = jax.lax.scan(
            fire_step, (x, v, dt, alpha, n_pos, nbr, lam, box, pH),
            None, length=block,
        )
        return (x, v, dt, alpha, n_pos, lam, box, pH), e[-1]

    carry0 = (
        state.x, jnp.zeros_like(state.v), jnp.asarray(dt_start, state.x.dtype),
        jnp.asarray(alpha_start, state.x.dtype), jnp.array(0, jnp.int32),
        state.lam, state.box, state.pH,
    )
    (x, *_), e_hist = jax.lax.scan(block_fn, carry0, None, length=n_blocks)
    return state.replace(x=x), e_hist
