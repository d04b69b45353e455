"""Elastic production driver for the tiled engine.

Runs MD in jitted chunks with LAMMPS-style capacity management (the
grow-on-overflow analog of `memory->grow`, SURVEY.md §2.3.7): the rebin
capacity flag trips one slot EARLY (layout.rebin), so when it fires the
chunk-start state is still complete — the driver retiles to a roomier W
(cost-aware, layout.retile_auto) and redoes the chunk, never dropping a
molecule. A flag that persists immediately after a retile is the
dangerous-build (drift) monitor instead; it is counted and reported, as
LAMMPS counts dangerous builds.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from constant_ph_tpu.tiled.engine import TiledEngine
from constant_ph_tpu.tiled.layout import retile_auto


@dataclass
class ElasticInfo:
    n_retiles: int = 0
    n_dangerous_blocks: int = 0
    final_W: int = 0
    retile_steps: list = field(default_factory=list)


def elastic_run(
    ts,
    tst,
    cfg,
    n_steps: int,
    *,
    chunk: int = 2000,
    bias=None,
    kspace_ep=None,
    margin_min: int = 6,
    on_chunk: Optional[Callable] = None,
    device=None,
):
    """Run `n_steps` of tiled MD with elastic tile capacity.

    on_chunk(step_count, ts, tst, obs) is called after every completed
    chunk (trajectory writers, loggers). Returns
    (ts, tst, obs_concat, ElasticInfo). Retiling keeps the cell grid, so
    Ewald/PME params remain valid across retiles.
    """
    cpu = jax.local_devices(backend="cpu")[0]
    if device is None:
        device = jax.devices()[0]
    # make_run(chunk) actually executes ceil(chunk/rebuild_every) full
    # rebuild blocks — round the chunk up so `done` counts real steps and
    # obs arrays / on_chunk cadence agree with the step accounting
    chunk = -(-chunk // cfg.rebuild_every) * cfg.rebuild_every

    def make_eng(ts_):
        kw = {}
        if bias is not None:
            kw["bias"] = bias
        return TiledEngine(ts_, cfg, kspace_ep=kspace_ep, **kw)

    eng = make_eng(ts)
    n_waters = eng.n_waters
    run = jax.jit(eng.make_run(chunk, detailed_flags=True))
    info = ElasticInfo()
    obs_parts = []
    done = 0
    while done < n_steps:
        tst2, (ov_cap, ov_drift), obs = run(tst)
        if bool(ov_cap):
            # capacity: grow W and REDO the chunk from its (complete)
            # start state — the early flag guarantees nothing was lost
            occ = int(np.asarray(tst.wvalid).sum(axis=1).max())
            with jax.default_device(cpu):
                ts, tst = retile_auto(
                    ts, jax.tree.map(jnp.asarray, jax.device_get(tst)),
                    max(occ, ts.params.W), margin_min=margin_min)
            tst = jax.device_put(tst, device)
            eng = make_eng(ts)
            run = jax.jit(eng.make_run(chunk, detailed_flags=True))
            info.n_retiles += 1
            info.retile_steps.append(done)
            continue
        if bool(ov_drift):
            # dangerous build (water drift past skin between rebins):
            # counted, as in LAMMPS; not a capacity problem
            info.n_dangerous_blocks += 1
        tst = tst2
        done += chunk
        assert int(np.asarray(tst.wvalid).sum()) == n_waters, \
            "molecule count changed — capacity invariant violated"
        obs_parts.append(obs)
        if on_chunk is not None:
            on_chunk(done, ts, tst, obs)
    info.final_W = ts.params.W
    obs_all = jax.tree.map(lambda *a: jnp.concatenate(a), *obs_parts)
    return ts, tst, obs_all, info
