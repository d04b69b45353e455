"""System container: everything a run needs, bundled (the input-deck layer)."""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax

from constant_ph_tpu.engine import Engine, EngineConfig
from constant_ph_tpu.forcefield import BondedParams, ForceField
from constant_ph_tpu.lambda_dyn import BiasParams, LambdaSpec
from constant_ph_tpu.neighbors import NeighborParams
from constant_ph_tpu.ops.bonded import make_bonded_fn
from constant_ph_tpu.state import SystemState


@dataclasses.dataclass
class System:
    """A fully-specified simulation (force field + initial state + sizing).

    The analog of a LAMMPS input deck + data file: what the reference's
    constructor args (fix_constant_pH.cpp:36-54) + the host's read_data
    provide together.
    """

    ff: ForceField
    state: SystemState
    nbr_params: NeighborParams
    bonded: Optional[BondedParams] = None
    constraints: object = None
    spec: Optional[LambdaSpec] = None
    groupH_mask: Optional[jax.Array] = None   # titratable-H group (ref groupHbit)

    def make_engine(self, config: EngineConfig, bias: BiasParams = BiasParams(),
                    kspace_fn=None, extra_potentials=()) -> Engine:
        bonded_fn = None
        if self.bonded is not None and int(self.bonded.bond_idx.shape[0]) > 0:
            bonded_fn = make_bonded_fn(self.bonded)
        return Engine(
            self.ff,
            self.nbr_params,
            config,
            spec=self.spec,
            bias=bias,
            bonded_fn=bonded_fn,
            kspace_fn=kspace_fn,
            constraints=self.constraints,
            extra_potentials=extra_potentials,
        )
