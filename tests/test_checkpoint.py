"""Checkpoint → exact resume (SURVEY.md §5.4): the λ state the reference
loses on restart must survive bit-exactly, including stochastic thermostats
(RNG key is part of the state)."""
import io

import jax.numpy as jnp
import numpy as np

from constant_ph_tpu import checkpoint, observables
from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.systems.water import solvated_acid


def test_exact_resume(tmp_path):
    sys_ = solvated_acid(n_side=3, rigid_water=False, cutoff=4.5, seed=8)
    cfg = EngineConfig(dt=0.5, thermostat="langevin", T=300.0,
                       lambda_thermostat="langevin", rebuild_every=10)
    eng = sys_.make_engine(cfg)

    # run 20 steps, checkpoint, run 20 more
    s1, nbr, _ = eng.run(sys_.state, 20)
    path = str(tmp_path / "ckpt.npz")
    checkpoint.save(path, s1)
    s2a, _, _ = eng.run(s1, 20)

    # resume from disk and run the same 20
    s1_loaded = checkpoint.load(path)
    assert int(s1_loaded.step) == int(s1.step)
    s2b, _, _ = eng.run(s1_loaded, 20)

    # bit-exact continuation (same PRNG key → same Langevin noise)
    np.testing.assert_array_equal(np.asarray(s2a.x), np.asarray(s2b.x))
    np.testing.assert_array_equal(np.asarray(s2a.v), np.asarray(s2b.v))
    np.testing.assert_array_equal(np.asarray(s2a.lam), np.asarray(s2b.lam))
    np.testing.assert_array_equal(np.asarray(s2a.v_lam), np.asarray(s2b.v_lam))


def test_observable_writers():
    sys_ = solvated_acid(n_side=3, rigid_water=False, cutoff=4.5, seed=9)
    eng = sys_.make_engine(EngineConfig(dt=0.5, rebuild_every=10))
    _, _, obs = eng.run(sys_.state, 20)

    jf = io.StringIO()
    observables.write_jsonl(obs, jf, every=5)
    lines = jf.getvalue().strip().split("\n")
    assert len(lines) == 4
    import json
    row = json.loads(lines[0])
    assert "h_conserved" in row and "lam" in row

    cf = io.StringIO()
    observables.write_csv(obs, cf, every=5)
    header = cf.getvalue().split("\n")[0]
    assert "lam_0" in header and "e_pot" in header


def test_protonation_fraction_estimator():
    lam = np.concatenate([np.full((30, 1), 0.9), np.full((70, 1), 0.1)])
    # burn-in removes the first 25 frames
    frac = observables.protonation_fraction(lam, burn_in=0.3)
    assert frac.shape == (1,)
    assert frac[0] == (lam[30:] > 0.5).mean()
    np.testing.assert_allclose(observables.hh_curve(4.0, 5.0), 1 / (1 + 0.1))
