"""SHAKE/RATTLE rigid-water constraints."""
import jax
import jax.numpy as jnp
import numpy as np

from constant_ph_tpu.ops.constraints import RigidTriatomic
from constant_ph_tpu.systems.water import R_HH, R_OH, _water_geometry


def _make(n_mol=5, seed=0):
    rng = np.random.default_rng(seed)
    geo = _water_geometry()
    xs = []
    for m in range(n_mol):
        xs.append(geo + rng.uniform(0, 20, size=3))
    x = jnp.asarray(np.concatenate(xs), dtype=jnp.float32)
    trip = np.arange(3 * n_mol).reshape(n_mol, 3)
    mass = np.tile([15.9994, 1.008, 1.008], n_mol)
    return x, RigidTriatomic(trip, mass, R_OH, R_HH), trip


BOX = jnp.array([100.0, 100.0, 100.0])


def _geometry_errors(x, trip):
    x = np.asarray(x)
    errs = []
    for t in np.asarray(trip):
        o, h1, h2 = x[t[0]], x[t[1]], x[t[2]]
        errs += [abs(np.linalg.norm(o - h1) - R_OH),
                 abs(np.linalg.norm(o - h2) - R_OH),
                 abs(np.linalg.norm(h1 - h2) - R_HH)]
    return max(errs)


def test_shake_restores_geometry():
    x_ref, cons, trip = _make()
    key = jax.random.PRNGKey(0)
    x_bad = x_ref + 0.08 * jax.random.normal(key, x_ref.shape)
    v = jnp.zeros_like(x_ref)
    x_fix, v_fix = cons.positions(x_ref, x_bad, v, BOX, dt=1.0)
    assert _geometry_errors(x_fix, trip) < 1e-5
    # velocity absorbed the displacement
    assert float(jnp.max(jnp.abs(v_fix))) > 0


def test_rattle_projects_velocities():
    x_ref, cons, trip = _make()
    key = jax.random.PRNGKey(1)
    v = 0.05 * jax.random.normal(key, x_ref.shape)
    v_fix = cons.velocities(x_ref, v, BOX)
    # relative velocity along each constraint direction must vanish
    x = np.asarray(x_ref)
    vf = np.asarray(v_fix)
    for t in np.asarray(trip):
        for a, b in [(t[0], t[1]), (t[0], t[2]), (t[1], t[2])]:
            s = x[a] - x[b]
            dv = vf[a] - vf[b]
            assert abs(np.dot(dv, s)) < 1e-6


def test_shake_across_pbc():
    # molecule straddling the box edge must not be torn apart
    x_ref, cons, trip = _make(n_mol=1)
    shift = jnp.array([99.9, 0.0, 0.0]) - x_ref[0]
    x_ref = x_ref + shift  # O near the +x face, H's possibly wrapped
    from constant_ph_tpu.state import wrap
    x_ref = wrap(x_ref, BOX)
    x_bad = x_ref + 0.05
    v = jnp.zeros_like(x_ref)
    x_fix, _ = cons.positions(x_ref, x_bad, v, BOX, dt=1.0)
    x = np.asarray(x_fix)
    box = np.asarray(BOX)
    o, h1, h2 = x[0], x[1], x[2]
    def dmin(a, b):
        d = a - b
        d -= box * np.round(d / box)
        return np.linalg.norm(d)
    assert abs(dmin(o, h1) - R_OH) < 1e-5
    assert abs(dmin(o, h2) - R_OH) < 1e-5
    assert abs(dmin(h1, h2) - R_HH) < 1e-5
