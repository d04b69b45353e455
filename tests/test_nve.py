"""NVE energy conservation on the LJ fluid — the foundation oracle
(SURVEY.md §4 tier 3 / §7.2 step 1)."""
import jax
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu.engine import Engine, EngineConfig
from constant_ph_tpu.systems import lj_fluid


def test_nve_energy_conservation():
    ff, state, nbp = lj_fluid(n_cells=3, T=80.0, seed=3)
    cfg = EngineConfig(dt=4.0, thermostat="nve", rebuild_every=10)
    eng = Engine(ff, nbp, cfg)
    state, nbr, obs = eng.run(state, 400)
    e = np.asarray(obs.h_conserved, dtype=np.float64)
    ke = np.asarray(obs.ke, dtype=np.float64)
    # relative drift of total energy vs kinetic-energy scale
    drift = abs(e[-1] - e[0])
    fluct = np.std(e)
    assert np.all(np.isfinite(e))
    assert fluct < 0.02 * np.mean(ke), (fluct, np.mean(ke))
    assert drift < 0.02 * np.mean(ke), (drift, np.mean(ke))


def test_langevin_thermostat_reaches_target():
    ff, state, nbp = lj_fluid(n_cells=3, T=20.0, seed=4)
    cfg = EngineConfig(dt=4.0, thermostat="langevin", T=120.0,
                       gamma=0.005, rebuild_every=10)
    eng = Engine(ff, nbp, cfg)
    state, nbr, obs = eng.run(state, 800)
    temps = np.asarray(obs.temp)
    mean_T = temps[400:].mean()
    assert abs(mean_T - 120.0) < 15.0, mean_T


def test_nhc_thermostat_reaches_target():
    ff, state, nbp = lj_fluid(n_cells=3, T=60.0, seed=5)
    cfg = EngineConfig(dt=4.0, thermostat="nhc", T=120.0,
                       tau=200.0, rebuild_every=10)
    eng = Engine(ff, nbp, cfg)
    state, nbr, obs = eng.run(state, 1200)
    temps = np.asarray(obs.temp)
    mean_T = temps[600:].mean()
    assert abs(mean_T - 120.0) < 18.0, mean_T
