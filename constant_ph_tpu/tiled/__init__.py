"""The TPU-native hot path: cell-tiled pair computation.

Measured motivation (v5e via this environment): XLA scalar gathers run at
~13k elements/ms on TPU — a (N, K) neighbor-list pair step at 24k atoms
would spend seconds per step just gathering positions. Row operations
(rolls, reshapes, batched elementwise) run at full bandwidth. So the hot
path stores the system in (n_cells, capacity) tiles and computes pair
interactions cell-block against cell-block over a half stencil of
`jnp.roll`s — zero gathers per step; binning (the only irregular op) runs
once per neighbor-rebuild interval on molecule-level rows.

Structure:
- layout.py — tile parameters, tiled state, canonical⇄tiled conversion,
  molecule-level re-binning
- forces.py — water-water / water-solute / solute-solute blocks with
  per-atom energy tallies and φ = ∂U/∂q
- shake.py  — SHAKE/RATTLE on tile-resident rigid water (fully regular)
- engine.py — the TiledEngine (same API/physics as engine.Engine)
"""
