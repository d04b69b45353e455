"""Pallas water-water kernel vs the XLA roll-stencil reference
(interpret mode on CPU — SURVEY.md §5.2 kernel-sanitizer policy)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from constant_ph_tpu.systems.water import solvated_acid
from constant_ph_tpu.tiled import forces as tforces
from constant_ph_tpu.tiled.layout import split_system, to_tiled
from constant_ph_tpu.tiled.pallas_ww import water_water_pallas


@pytest.mark.parametrize("style,alpha", [("dsf", 0.2), ("cut", 0.35)])
@pytest.mark.acceptance
def test_pallas_matches_roll_stencil(style, alpha):
    # dilute box → grid 4³ with small W (fast in interpret mode)
    sys_ = solvated_acid(n_side=8, spacing=6.4, rigid_water=True,
                         lambda_coupled=True, cutoff=8.0, skin=2.0,
                         coul_style=style, alpha=alpha, seed=12)
    ts = split_system(sys_)
    assert min(ts.params.grid) >= 3
    tst = to_tiled(ts, sys_.state)
    p = ts.params
    gx, gy, gz = p.grid
    wxg = tst.wx.reshape(3, gx, gy, gz, 3 * p.W)
    wvg = tst.wvalid.reshape(gx, gy, gz, p.W)

    ref = tforces.water_water(wxg, wvg, ts.water, p, tst.box,
                              style=style, alpha=alpha, rc=p.cutoff)
    got = water_water_pallas(wxg, wvg, ts.water, p, tst.box,
                             style=style, alpha=alpha, rc=p.cutoff,
                             interpret=True)

    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=2e-4,
                               atol=1e-4)  # e_lj
    np.testing.assert_allclose(float(got[1]), float(ref[1]), rtol=2e-4,
                               atol=1e-3)  # e_coul
    for d in range(3):
        f_r = np.asarray(ref[2][d])
        f_g = np.asarray(got[2][d])
        scale = max(1.0, np.abs(f_r).max())
        np.testing.assert_allclose(f_g / scale, f_r / scale, atol=2e-5)
    np.testing.assert_allclose(np.asarray(got[4]), np.asarray(ref[4]),
                               rtol=1e-3, atol=1e-3)  # phi
    # per-atom tallies sum to totals
    np.testing.assert_allclose(
        float(jnp.sum(got[3])), float(got[0] + got[1]), rtol=1e-4)


@pytest.mark.parametrize("style,alpha", [("dsf", 0.2), ("cut", 0.35)])
def test_pallas_fast_matches_xla_fast(style, alpha):
    """The fair-rematch kernel (water_water_pallas_fast) vs the XLA hot
    path it mirrors — identical layout tricks, so tolerances are tight."""
    from constant_ph_tpu.tiled.pallas_ww import water_water_pallas_fast

    sys_ = solvated_acid(n_side=8, spacing=6.4, rigid_water=True,
                         lambda_coupled=True, cutoff=8.0, skin=2.0,
                         coul_style=style, alpha=alpha, seed=12)
    ts = split_system(sys_)
    assert min(ts.params.grid) >= 3
    tst = to_tiled(ts, sys_.state)
    p = ts.params
    gx, gy, gz = p.grid
    wxg = tst.wx.reshape(3, gx, gy, gz, 3 * p.W)

    ref = tforces.water_water_fast(wxg, ts.water, p, tst.box,
                                   style=style, alpha=alpha, rc=p.cutoff)
    got = water_water_pallas_fast(wxg, ts.water, p, tst.box,
                                  style=style, alpha=alpha, rc=p.cutoff,
                                  interpret=True)

    np.testing.assert_allclose(float(got[0]), float(ref[0]), rtol=1e-5,
                               atol=1e-5)  # e_lj
    np.testing.assert_allclose(float(got[1]), float(ref[1]), rtol=1e-5,
                               atol=1e-4)  # e_coul
    for d in range(3):
        f_r = np.asarray(ref[2][d])
        f_g = np.asarray(got[2][d])
        scale = max(1.0, np.abs(f_r).max())
        np.testing.assert_allclose(f_g / scale, f_r / scale, atol=3e-6)
