"""pH replica exchange: Metropolis bookkeeping + tiled-engine REX."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from constant_ph_tpu import units
from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.lambda_dyn import BiasParams
from constant_ph_tpu.parallel.replica import (
    make_rex_runner_tiled,
    stack_replicas,
    swap_phs,
)
from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import split_system, to_tiled


def test_swap_preserves_ph_multiset_and_signs():
    # synthetic states: R replicas with distinct λ and pH
    from constant_ph_tpu.state import make_state

    R = 6
    states = []
    for r in range(R):
        st = make_state(
            x=np.zeros((2, 3)), box=np.ones(3) * 10.0,
            lam=[0.1 + 0.15 * r], pH=3.0 + r, seed=r)
        states.append(st)
    batch = stack_replicas(states)
    key = jax.random.PRNGKey(0)
    pH0 = np.sort(np.asarray(batch.pH))
    n_acc = 0
    for sweep in range(50):
        key, k = jax.random.split(key)
        batch, acc = swap_phs(batch, k, BiasParams(), sweep % 2)
        n_acc += int(jnp.sum(acc))
        np.testing.assert_array_equal(np.sort(np.asarray(batch.pH)), pH0)
    assert n_acc > 0  # some swaps must be accepted


def test_detailed_balance_exponent():
    # swapping pH between two replicas must use βΔ = ln10·ΔpH·ΔF exactly:
    # check acceptance is 1 when the move lowers the generalized energy
    from constant_ph_tpu.state import make_state

    # replica 0: low pH, mostly deprotonated (f≈1) — favorable to swap up
    s0 = make_state(x=np.zeros((2, 3)), box=np.ones(3) * 10, lam=[0.95],
                    pH=3.0, seed=0)
    s1 = make_state(x=np.zeros((2, 3)), box=np.ones(3) * 10, lam=[0.05],
                    pH=8.0, seed=1)
    batch = stack_replicas([s0, s1])
    # β·ΔH = ln10·(pH0−pH1)(F0−F1) = ln10·(−5)(≈1) < 0 → always accept
    accepted_any = False
    key = jax.random.PRNGKey(3)
    batch2, acc = swap_phs(batch, key, BiasParams(), 0)
    assert bool(acc[0]) and bool(acc[1])
    np.testing.assert_allclose(np.asarray(batch2.pH), [8.0, 3.0])


@pytest.mark.acceptance
def test_tiled_rex_block():
    sys_ = solvated_acid(n_side=4, rigid_water=True, lambda_coupled=0.2,
                         cutoff=6.0, coul_style="dsf", alpha=0.2, seed=3)
    ts = split_system(sys_)
    cfg = EngineConfig(dt=1.0, thermostat="langevin", T=300.0, gamma=0.01,
                       lambda_thermostat="langevin", rebuild_every=5)
    eng = TiledEngine(ts, cfg)
    R = 4
    tsts = []
    for r in range(R):
        t = to_tiled(ts, sys_.state)
        tsts.append(t.replace(pH=jnp.asarray(3.0 + r, t.pH.dtype),
                              key=jax.random.PRNGKey(r)))
    batch = stack_replicas(tsts)
    block = jax.jit(make_rex_runner_tiled(eng, 10))
    key = jax.random.PRNGKey(0)
    for sweep in range(4):
        batch, key, acc, obs = block(batch, key, sweep % 2)
    assert bool(jnp.all(jnp.isfinite(obs.h_conserved)))
    np.testing.assert_array_equal(
        np.sort(np.asarray(batch.pH)), [3.0, 4.0, 5.0, 6.0])


def test_replica_finite_and_rollback():
    """Per-replica failure detection (SURVEY.md §5.3): a NaN walker is
    detected, rolled back to its pre-chunk state with a reseeded key, and
    healthy walkers keep their advanced state (int leaves included)."""
    import dataclasses

    from constant_ph_tpu.parallel.replica import (replica_finite,
                                                  rollback_replicas)

    @jax.tree_util.register_dataclass
    @dataclasses.dataclass
    class Batch:
        x: jax.Array
        step: jax.Array
        key: jax.Array

        def replace(self, **kw):
            return dataclasses.replace(self, **kw)

    R = 4
    prev = Batch(x=jnp.ones((R, 5)),
                 step=jnp.arange(R, dtype=jnp.int32),
                 key=jax.vmap(jax.random.PRNGKey)(
                     jnp.arange(R, dtype=jnp.uint32)))
    new = Batch(x=(prev.x * 2).at[2, 3].set(jnp.nan),
                step=prev.step + 1, key=prev.key)

    fin = np.asarray(jax.jit(replica_finite)(new))
    assert fin.tolist() == [True, True, False, True]

    merged = rollback_replicas(new, prev, jnp.asarray(fin), salt=17)
    # bad replica restored (float AND int leaves), healthy ones advanced
    assert np.allclose(np.asarray(merged.x[2]), 1.0)
    assert np.allclose(np.asarray(merged.x[1]), 2.0)
    assert int(merged.step[2]) == 2 and int(merged.step[1]) == 2
    # bad replica's key reseeded; healthy keys untouched
    assert not np.array_equal(np.asarray(merged.key[2]),
                              np.asarray(prev.key[2]))
    assert np.array_equal(np.asarray(merged.key[1]),
                          np.asarray(prev.key[1]))
    # all-finite batch: rollback is the identity on state leaves
    fin_ok = jnp.ones((R,), bool)
    same = rollback_replicas(new, prev, fin_ok, salt=3)
    assert np.array_equal(np.asarray(same.x), np.asarray(new.x),
                          equal_nan=True)
    assert np.array_equal(np.asarray(same.key), np.asarray(new.key))
