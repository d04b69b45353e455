"""constant_ph_tpu — a standalone, TPU-native constant-pH molecular-dynamics engine.

Built from scratch in JAX (jit / Pallas / GSPMD sharding over device meshes), providing
the capabilities of the reference LAMMPS ``fix constant_pH`` λ-dynamics extension
(MahdiTavakol/Constant_pH): titratable sites carry continuous coordinates
λ ∈ [0, 1] with fictitious mass, integrated alongside the atoms under a
pH-dependent free-energy term and a Donnini–Ullmann bias potential
(fix_constant_pH.cpp:85-96, 128-145), with per-atom charges interpolated
q(λ) between protonated and deprotonated charge sets (the scheme the reference
author states is correct at fix_constant_pH.cpp:156-161), charge neutrality
maintained through a buffer group (the `modify_water` intent,
fix_constant_pH.h:58), and exact dU/dλ accumulated through both real-space and
reciprocal-space electrostatics.

The package layout:

- ``units``        — LAMMPS-"real"-compatible unit system (kcal/mol, Å, fs, e)
- ``state``        — SystemState / NeighborList pytrees (the Atom store analog)
- ``forcefield``   — bonds/angles/dihedrals/impropers/exclusions + pair tables
- ``neighbors``    — jitted cell list → padded (N, K) neighbor lists
- ``ops``          — pair, bonded, constraints, factorized Ewald, smooth PME
- ``lambda_dyn``   — λ-dynamics: bias U(λ), switching f(λ), q(λ), λ integrator
- ``integrators``  — velocity-Verlet, Langevin (BAOAB), Nosé–Hoover chains
- ``engine``       — the composed jitted MD step + run loop + observables
- ``tiled``        — the production cell-tile engine: gather-free stencil
                     forces, lane-native SHAKE, Pallas water-water kernels,
                     elastic capacity driver, MC-barostat NPT
- ``parallel``     — replica exchange / spatial sharding over a jax Mesh
- ``systems``      — procedural system builders (water boxes, titratable sites,
                     synthetic solvated protein) + LAMMPS data file reader
- ``groups/observables/checkpoint/profiling/trajectory/titration/minimize``
                   — aux subsystems (SURVEY.md §5)
"""

__version__ = "0.1.0"

from constant_ph_tpu import units  # noqa: F401
