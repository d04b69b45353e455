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


def test_tiled_shake_matches_reference_core():
    """Lane-native TiledWaterShake vs the ops.constraints molecule-batch
    cores on random batches INCLUDING near-degenerate (almost collinear)
    molecules — the trust-region and masking behavior must match, not just
    equilibrated-geometry results (the confirmed round-1 regression was a
    dropped trust-region clamp only visible on pathological inputs)."""
    import numpy as np
    import jax.numpy as jnp

    from constant_ph_tpu.ops.constraints import (
        _C, mrattle_dv, mshake_delta,
    )
    from constant_ph_tpu.tiled.layout import TileParams, WaterModel
    from constant_ph_tpu.tiled.shake import TiledWaterShake

    rng = np.random.default_rng(0)
    G, W = 4, 8
    M = G * W
    d_OH, d_HH = 1.0, 1.633
    wm = WaterModel(-0.8476, 0.4238, 625.5, 629400.0, 0.0,
                    d_OH, d_HH, 15.9994, 1.008)
    p = TileParams(grid=(1, 1, 4), W=W, half_stencil=(),
                   cutoff=4.0, skin=1.0)
    box = jnp.asarray([50.0, 50.0, 50.0])

    # reference geometry + noise; make some molecules nearly collinear
    base = np.array([[0.0, 0.0, 0.0], [d_OH, 0.0, 0.0],
                     [-0.3, 0.95, 0.0]])
    xm_ref = np.tile(base, (M, 1, 1)) + rng.normal(0, 0.02, (M, 3, 3))
    xm_ref += rng.uniform(5, 45, (M, 1, 3))
    xm = xm_ref + rng.normal(0, 0.15, (M, 3, 3))
    xm[: M // 4, 2] = xm[: M // 4, 0] + (
        xm[: M // 4, 1] - xm[: M // 4, 0]
    ) * 1.02 + rng.normal(0, 1e-3, (M // 4, 3))   # near-collinear
    vm = rng.normal(0, 0.05, (M, 3, 3))
    valid = (rng.uniform(size=M) > 0.2).astype(np.float32)

    inv_m = 1.0 / np.array(wm.mass_pattern)
    W3 = np.einsum("ct,dt,t->cd", _C, _C, inv_m)[None]
    d2 = np.array([d_OH**2, d_OH**2, d_HH**2])
    delta_ref = np.asarray(mshake_delta(
        jnp.asarray(xm, jnp.float32), jnp.asarray(xm_ref, jnp.float32),
        jnp.asarray(inv_m[None], jnp.float32), jnp.asarray(W3, jnp.float32),
        jnp.asarray(_C, jnp.float32), jnp.asarray(d2, jnp.float32), 10))
    dv_ref = np.asarray(mrattle_dv(
        jnp.asarray(xm, jnp.float32), jnp.asarray(vm, jnp.float32),
        jnp.asarray(inv_m[None], jnp.float32), jnp.asarray(W3, jnp.float32),
        jnp.asarray(_C, jnp.float32)))
    delta_ref = delta_ref * valid[:, None, None]
    dv_ref = dv_ref * valid[:, None, None]

    # pack into tile layout (3, G, 3W): mol m -> cell m//W slot m%W
    def to_tiles(a):
        return jnp.asarray(
            a.reshape(G, W, 3, 3).transpose(3, 0, 1, 2).reshape(3, G, 3 * W),
            jnp.float32)

    wx = to_tiles(xm)
    wxr = to_tiles(xm_ref)
    wvv = to_tiles(vm)
    wvalid = jnp.asarray(valid.reshape(G, W))

    shake = TiledWaterShake(wm, p)
    wx2, _ = shake.positions(wxr, wx, jnp.zeros_like(wvv), box, 1.0, wvalid)
    delta_tiled = np.asarray(wx2 - wx)
    delta_tiled = delta_tiled.reshape(3, G, W, 3).transpose(1, 2, 3, 0)\
        .reshape(M, 3, 3)
    np.testing.assert_allclose(delta_tiled, delta_ref, atol=2e-4)
    # the trust region must bound every atom move even for the collinear set
    assert np.abs(delta_tiled).max() < 10 * 0.5 + 1.0

    wv2 = shake.velocities(wx, wvv, box, wvalid)
    dv_tiled = np.asarray(wv2 - wvv).reshape(3, G, W, 3)\
        .transpose(1, 2, 3, 0).reshape(M, 3, 3)
    np.testing.assert_allclose(dv_tiled, dv_ref, atol=2e-4)
