"""Named groups + failure-detection guards."""
import jax.numpy as jnp
import numpy as np
import pytest

from constant_ph_tpu.groups import Groups, check_finite


def test_groups_define_find_count():
    g = Groups(10)
    g.define("H", ids=[2, 5])
    g.define("W", ids=[6, 7, 8])
    assert g.count("H") == 2
    assert g.count("W") == 3        # the 3-atom water validation analog
    assert g.count("all") == 10
    u = g.union("H", "W")
    assert int(jnp.sum(u)) == 5
    with pytest.raises(KeyError):
        g.find("nope")
    vals = jnp.arange(10.0)
    assert float(Groups.masked_sum(vals, g.find("H"))) == 7.0


def test_check_finite():
    ok = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
    check_finite(ok)
    bad = {"a": jnp.array([1.0, jnp.nan])}
    with pytest.raises(FloatingPointError):
        check_finite(bad)


def test_memory_usage_reporting():
    from constant_ph_tpu.engine import EngineConfig
    from constant_ph_tpu.systems.water import solvated_acid
    from constant_ph_tpu.tiled.engine import TiledEngine
    from constant_ph_tpu.tiled.layout import split_system

    sys_ = solvated_acid(n_side=4, cutoff=6.0, seed=1)
    ts = split_system(sys_)
    eng = TiledEngine(ts, EngineConfig())
    mu = eng.memory_usage()
    assert mu["total"] > 0
    assert mu["total"] == mu["water_tiles"] + mu["cell_masks"] + mu["solute"]
