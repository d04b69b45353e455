"""Tile layout: molecule-binned cell tiles + canonical⇄tiled conversion.

Atom classes (SURVEY.md §5.7's "atom tiles"):
- WATER: rigid 3-site solvent, binned by O position into (G, W) molecule
  slots; atom arrays are (3dims, G, 3W) with each molecule's O,H1,H2 in
  consecutive slots, so (G, 3W) ⇄ (G, W, 3) reshapes are free and SHAKE /
  flexible terms stay fully regular.
- SOLUTE: everything else (protein/acid atoms AND each λ site's buffer
  water — the reference's groupW, fix_constant_pH.cpp:42-46 — so λ only
  ever touches solute charges). Solute stays dense (Ns,) with exact
  pairwise LJ/special tables (Ns is small).

Re-binning moves molecule-level ROWS (fast on TPU); the per-step pair math
in forces.py then needs no gathers at all.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from constant_ph_tpu import units
from constant_ph_tpu.lambda_dyn import LambdaSpec
from constant_ph_tpu.state import SystemState, wrap


# invalid tile slots are parked at PARK_BASE + PARK_SPACING·flat_slot on all
# three axes: unique positions ≥ √3·10 Å apart and ≥ 10⁴ Å from any real
# atom, so the fast pair path (tiled.forces.water_water_fast) needs no
# validity masking — parked pairs simply fall outside the cutoff
PARK_BASE = 1.0e4
PARK_SPACING = 10.0


@struct.dataclass
class TileParams:
    grid: tuple = struct.field(pytree_node=False)
    W: int = struct.field(pytree_node=False)            # molecules per cell
    half_stencil: tuple = struct.field(pytree_node=False)
    cutoff: float = struct.field(pytree_node=False)
    skin: float = struct.field(pytree_node=False)

    @property
    def G(self) -> int:
        return self.grid[0] * self.grid[1] * self.grid[2]


@struct.dataclass
class TiledState:
    """Complete dynamic state in tile layout (the in-loop SystemState)."""

    wx: jax.Array       # (3, G, 3W) water atom coords per dim
    wv: jax.Array       # (3, G, 3W)
    wvalid: jax.Array   # (G, W) 1.0 for real molecules
    wid: jax.Array      # (G, W) int32 original water-molecule index
    sx: jax.Array       # (Ns, 3) solute coords
    sv: jax.Array       # (Ns, 3)
    box: jax.Array
    lam: jax.Array
    v_lam: jax.Array
    pH: jax.Array
    step: jax.Array
    key: jax.Array
    nhc_xi: jax.Array
    nhc_lam_xi: jax.Array
    # (Ns,) last computed reciprocal-space per-solute-atom potential φ, the
    # k-space MTS carry: persists across make_run invocations so λ forces
    # keep the mollified stale-φ coupling even when a driver chunk does not
    # start on a kspace_every boundary (zeros before the first k-space
    # evaluation / when there is no k-space term)
    phi_recip_s: jax.Array
    # (S, nbins) metadynamics λ-bias tables — V and dV/dλ on the λ grid
    # (constant_ph_tpu/metad.py); (0, 0) when metadynamics is off. Part of
    # the dynamic state because the bias is history-dependent.
    metad_v: jax.Array
    metad_dv: jax.Array
    # () cumulative non-Hamiltonian energy injected by thermostats
    # (NHC scalings + Langevin O-steps) and metad deposits — see
    # SystemState.ext_work. KEEP LAST: checkpoint loaders are
    # forward-tolerant by flatten order (tail fields default).
    ext_work: jax.Array


@struct.dataclass
class SoluteTables:
    """Static solute interaction tables (exact mixing — Ns is small)."""

    q0: jax.Array        # (Ns,) base charges (λ=0)
    mass: jax.Array      # (Ns,) (padding gets mass 1, zero charge/LJ)
    smask: jax.Array     # (Ns,) 1.0 for real solute atoms
    c6: jax.Array        # (Ns, Ns) incl. special-LJ scaling, zero diag
    c12: jax.Array       # (Ns, Ns)
    eshift: jax.Array    # (Ns, Ns) LJ shift (scaled like c6/c12)
    scoul: jax.Array     # (Ns, Ns) Coulomb special factors, zero diag
    c6_cross: jax.Array  # (Ns,) vs water O
    c12_cross: jax.Array # (Ns,)
    eshift_cross: jax.Array  # (Ns,)


class WaterModel:
    """Static 3-site water constants (SPC/E by default)."""

    def __init__(self, qO, qH, c6_OO, c12_OO, eshift_OO, d_OH, d_HH,
                 mO, mH):
        self.q_pattern = (qO, qH, qH)
        self.mass_pattern = (mO, mH, mH)
        self.c6_OO = c6_OO
        self.c12_OO = c12_OO
        self.eshift_OO = eshift_OO
        self.d_OH = d_OH
        self.d_HH = d_HH


def make_tile_params(box, cutoff, *, skin=2.0, mol_radius=1.0,
                     water_density=0.034, safety=1.6) -> TileParams:
    """Host-side sizing. Cell size ≥ cutoff + skin + 2·mol_radius because
    molecules are binned by their O atom."""
    box = np.asarray(box, dtype=np.float64)
    need = cutoff + skin + 2.0 * mol_radius
    grid = tuple(int(max(1, np.floor(b / need))) for b in box)
    if min(grid) < 3:
        # a ±1 roll stencil double-counts (grid 2) or self-pairs (grid 1);
        # small boxes use one dense all-pairs block instead
        grid = (1, 1, 1)
        offsets = ()
    else:
        # half stencil: 13 of the 26 neighbor offsets (unique up to sign) —
        # each unordered cell pair is computed once, both sides accumulated
        offsets = tuple(
            (ox, oy, oz)
            for ox in (-1, 0, 1) for oy in (-1, 0, 1) for oz in (-1, 0, 1)
            if (ox, oy, oz) > (-ox, -oy, -oz)
        )
    cell_vol = float(np.prod(box / np.maximum(np.array(grid), 1)))
    W = int(np.ceil(water_density * cell_vol * safety)) + 2
    W = max(4, -(-W // 4) * 4)
    return TileParams(grid=grid, W=W, half_stencil=offsets,
                      cutoff=float(cutoff), skin=float(skin))


# ---------------------------------------------------------------------------
# host-side split + conversion
# ---------------------------------------------------------------------------

class TiledSystem:
    """Host-side bundle: tile params + static tables + index maps back to
    the canonical atom order."""

    def __init__(self, params, water, solute_tables, spec, bonded,
                 groupH_mask, water_atom_ids, solute_ids, n_atoms,
                 solute_constraints=None, coul_style="cut", alpha=0.0,
                 cutoff=9.0):
        self.params = params
        self.water = water                      # WaterModel
        self.solute = solute_tables             # SoluteTables
        self.spec = spec                        # solute-indexed LambdaSpec
        self.bonded = bonded                    # solute-indexed BondedParams
        self.groupH_mask = groupH_mask          # (Ns,)
        self.water_atom_ids = water_atom_ids    # (Mw, 3) canonical atom ids
        self.solute_ids = solute_ids            # (Ns_real,) canonical ids
        self.n_atoms = n_atoms
        self.solute_constraints = solute_constraints
        self.coul_style = coul_style
        self.alpha = alpha
        self.cutoff = cutoff


def split_system(system, *, skin=2.0, tile_safety=1.6) -> TiledSystem:
    """Classify atoms of a systems.base.System into water tiles + solute.

    Water = rigid triatomics from system.constraints, EXCEPT molecules
    containing λ-site atoms (buffer waters) which become solute.
    """
    import dataclasses as dc

    from constant_ph_tpu.ops.constraints import RigidTriatomic

    ff = system.ff
    n = int(ff.mass.shape[0])
    trip = (np.asarray(system.constraints.triplets)
            if system.constraints is not None else np.zeros((0, 3), np.int64))

    site_atoms = set()
    if system.spec is not None:
        site_atoms = set(np.asarray(system.spec.atom_idx).reshape(-1).tolist())

    water_rows = []
    solute_ids = set(range(n))
    buffer_trips = []
    for t in trip:
        if site_atoms & set(t.tolist()):
            buffer_trips.append(t)
            continue  # buffer water → solute
        water_rows.append(t)
        solute_ids -= set(t.tolist())
    water_atom_ids = np.array(water_rows, dtype=np.int64).reshape(-1, 3)
    solute_ids = np.array(sorted(solute_ids), dtype=np.int64)
    ns_real = len(solute_ids)
    Ns = max(8, -(-ns_real // 8) * 8)

    # canonical → solute-local index map
    sol_local = -np.ones(n, dtype=np.int64)
    sol_local[solute_ids] = np.arange(ns_real)

    pp = ff.pair
    types = np.asarray(ff.type)
    c6_t = np.asarray(pp.c6)
    c12_t = np.asarray(pp.c12)
    esh_t = np.asarray(pp.e_shift)
    # identify the water O type from the first water triplet
    if len(water_rows) or len(buffer_trips):
        o_type = int(types[(water_rows or buffer_trips)[0][0]])
    else:
        o_type = 0

    st = types[solute_ids]
    c6 = c6_t[st[:, None], st[None, :]]
    c12 = c12_t[st[:, None], st[None, :]]
    esh = esh_t[st[:, None], st[None, :]]
    scoul = np.ones((ns_real, ns_real))
    slj = np.ones((ns_real, ns_real))
    sp_lj = np.asarray(pp.special_lj)
    sp_c = np.asarray(pp.special_coul)
    ei = np.asarray(ff.excl_idx)
    ec = np.asarray(ff.excl_code)
    for li, ci in enumerate(solute_ids):
        for s in range(ei.shape[1]):
            j = ei[ci, s]
            if j < 0:
                continue
            lj_ = sol_local[j]
            if lj_ < 0:
                continue
            code = ec[ci, s]
            slj[li, lj_] = sp_lj[code]
            scoul[li, lj_] = sp_c[code]
    np.fill_diagonal(scoul, 0.0)
    np.fill_diagonal(slj, 0.0)

    def pad2(a, fill=0.0):
        out = np.full((Ns, Ns), fill, dtype=np.float64)
        out[:ns_real, :ns_real] = a
        return out

    def pad1(a, fill=0.0):
        out = np.full((Ns,), fill, dtype=np.float64)
        out[:ns_real] = a
        return out

    dtype = ff.q0.dtype
    tables = SoluteTables(
        q0=jnp.asarray(pad1(np.asarray(ff.q0)[solute_ids]), dtype=dtype),
        mass=jnp.asarray(pad1(np.asarray(ff.mass)[solute_ids], 1.0), dtype=dtype),
        smask=jnp.asarray(pad1(np.ones(ns_real)), dtype=dtype),
        c6=jnp.asarray(pad2(c6 * slj), dtype=dtype),
        c12=jnp.asarray(pad2(c12 * slj), dtype=dtype),
        eshift=jnp.asarray(pad2(esh * slj), dtype=dtype),
        scoul=jnp.asarray(pad2(scoul), dtype=dtype),
        c6_cross=jnp.asarray(pad1(c6_t[st, o_type]), dtype=dtype),
        c12_cross=jnp.asarray(pad1(c12_t[st, o_type]), dtype=dtype),
        eshift_cross=jnp.asarray(pad1(esh_t[st, o_type]), dtype=dtype),
    )

    # water model constants from the force field; rigid distances come from
    # the System's constraint object
    ow = water_atom_ids[0][0] if len(water_rows) else buffer_trips[0][0]
    hw = (water_atom_ids[0][1] if len(water_rows) else buffer_trips[0][1])
    qs = np.asarray(ff.q0)
    cons = system.constraints
    d_OH = float(np.sqrt(cons.d2[0])) if cons is not None else 1.0
    d_HH = float(np.sqrt(cons.d2[2])) if cons is not None else 1.633

    water = WaterModel(
        qO=float(qs[ow]), qH=float(qs[hw]),
        c6_OO=float(c6_t[o_type, o_type]),
        c12_OO=float(c12_t[o_type, o_type]),
        eshift_OO=float(esh_t[o_type, o_type]),
        d_OH=d_OH, d_HH=d_HH,
        mO=float(np.asarray(ff.mass)[ow]), mH=float(np.asarray(ff.mass)[hw]),
    )

    # remap λ spec + bonded + groupH to solute-local indices
    spec = system.spec
    if spec is not None:
        new_idx = sol_local[np.asarray(spec.atom_idx)]
        assert (new_idx >= 0).all(), "λ-site atom not in solute set"
        spec = spec.replace(atom_idx=jnp.asarray(new_idx.astype(np.int32)))
    bonded = system.bonded
    if bonded is not None and int(bonded.bond_idx.shape[0]):
        # drop mask-0 rows first: data-file decks carry rigid-water springs
        # (masked off — SHAKE owns them, systems/lammps_data.py), whose
        # atoms are by construction NOT in the solute set
        def live(idx, mask, *vals):
            keep = np.asarray(mask) > 0.5
            return (np.asarray(idx)[keep],
                    *[jnp.asarray(np.asarray(v)[keep]) for v in
                      (mask,) + vals])

        def remap(idx):
            m = sol_local[np.asarray(idx)]
            assert (m >= 0).all(), ("bonded atom not in solute set "
                                    "(flexible water unsupported in tiled "
                                    "path)")
            return jnp.asarray(m.astype(np.int32))

        b_idx, b_mask, b_k, b_r0 = live(
            bonded.bond_idx, bonded.bond_mask, bonded.bond_k, bonded.bond_r0)
        a_idx, a_mask, a_k, a_t0 = live(
            bonded.angle_idx, bonded.angle_mask, bonded.angle_k,
            bonded.angle_t0)
        bonded = bonded.replace(
            bond_idx=remap(b_idx), bond_mask=b_mask, bond_k=b_k,
            bond_r0=b_r0,
            angle_idx=(remap(a_idx) if a_idx.shape[0]
                       else jnp.zeros((0, 3), jnp.int32)),
            angle_mask=a_mask, angle_k=a_k, angle_t0=a_t0,
            dihedral_idx=remap(bonded.dihedral_idx) if bonded.dihedral_idx.shape[0] else bonded.dihedral_idx,
            improper_idx=remap(bonded.improper_idx) if bonded.improper_idx.shape[0] else bonded.improper_idx,
        )
    gh = np.zeros(Ns, dtype=bool)
    if system.groupH_mask is not None:
        gh_can = np.asarray(system.groupH_mask)
        gh[:ns_real] = gh_can[solute_ids]

    # buffer waters stay rigid: small solute-indexed constraint set
    solute_constraints = None
    if buffer_trips:
        bt = sol_local[np.array(buffer_trips)]
        assert (bt >= 0).all()
        solute_constraints = RigidTriatomic(
            bt.astype(np.int32), np.asarray(tables.mass), d_OH, d_HH)

    box = np.asarray(system.state.box)
    # centroid binning: max atom-to-centroid distance for a rigid triatomic
    # is |2·h1 − h2|/3 ≈ 0.84·d_OH (plus slack)
    params = make_tile_params(box, pp.cutoff, skin=skin,
                              mol_radius=0.87 * d_OH + 0.05,
                              safety=tile_safety)
    return TiledSystem(
        params=params, water=water, solute_tables=tables, spec=spec,
        bonded=bonded, groupH_mask=jnp.asarray(gh),
        water_atom_ids=water_atom_ids, solute_ids=solute_ids, n_atoms=n,
        solute_constraints=solute_constraints,
        coul_style=pp.coul_style, alpha=pp.alpha, cutoff=pp.cutoff,
    )


def to_tiled(ts: TiledSystem, state: SystemState) -> TiledState:
    """Canonical SystemState → TiledState (host-side, boundary only)."""
    p = ts.params
    G, W = p.G, p.W
    x = np.asarray(state.x, dtype=np.float64)
    v = np.asarray(state.v)
    box = np.asarray(state.box, dtype=np.float64)
    dtype = state.x.dtype

    Mw = ts.water_atom_ids.shape[0]
    grid = np.array(p.grid)
    cell = box / grid
    # bin by molecule CENTROID (max atom offset 0.84 Å for 3-site water vs
    # 1.0 Å for the O atom — permits smaller cells); unwrap satellites into
    # the O image first in case input molecules straddle the box seam
    xm_all = x[ts.water_atom_ids]                         # (Mw, 3atoms, 3)
    rel = xm_all - xm_all[:, :1, :]
    rel -= box[None, None, :] * np.round(rel / box[None, None, :])
    cen = xm_all[:, 0, :] + rel.mean(axis=1)
    o_pos = wrap(jnp.asarray(cen), jnp.asarray(box))
    ci = np.clip((np.asarray(o_pos) // cell).astype(np.int64), 0, grid - 1)
    cid = (ci[:, 0] * grid[1] + ci[:, 1]) * grid[2] + ci[:, 2]
    order = np.argsort(cid, kind="stable")
    wx = np.zeros((3, G, 3 * W))
    wv = np.zeros((3, G, 3 * W))
    wvalid = np.zeros((G, W))
    wid = np.full((G, W), -1, dtype=np.int32)
    slot_count = np.zeros(G, dtype=np.int64)
    # invalid slots are PARKED at unique far positions (≥ 17 Å apart, ≥ 10⁴ Å
    # from the box) so the fast pair path needs no validity masks; real
    # molecules are stored box-wrapped (by centroid image) so rolled tiles
    # need only per-cell boundary shifts, not per-pair min-image
    park = PARK_BASE + PARK_SPACING * np.arange(G * W, dtype=np.float64)
    wx[:] = park.reshape(G, W)[None, :, :].repeat(3, axis=2).reshape(
        1, G, 3 * W)
    img = box[None, :] * np.floor(np.asarray(cen) / box[None, :])  # (Mw, 3)
    for m in order:
        c = cid[m]
        s = slot_count[c]
        if s >= W:
            raise ValueError("tile capacity W exceeded at build")
        slot_count[c] += 1
        ids = ts.water_atom_ids[m]
        for a in range(3):
            wx[:, c, 3 * s + a] = x[ids[a]] - img[m]
            wv[:, c, 3 * s + a] = v[ids[a]]
        wvalid[c, s] = 1.0
        wid[c, s] = m

    ns_real = len(ts.solute_ids)
    Ns = ts.solute.q0.shape[0]
    sx = np.zeros((Ns, 3))
    sv = np.zeros((Ns, 3))
    sx[:ns_real] = x[ts.solute_ids]
    sv[:ns_real] = v[ts.solute_ids]
    # park padded solute atoms far outside the box (masked anyway)
    sx[ns_real:] = box * 2.0 + np.arange(Ns - ns_real)[:, None]

    return TiledState(
        wx=jnp.asarray(wx, dtype=dtype), wv=jnp.asarray(wv, dtype=dtype),
        wvalid=jnp.asarray(wvalid, dtype=dtype), wid=jnp.asarray(wid),
        sx=jnp.asarray(sx, dtype=dtype), sv=jnp.asarray(sv, dtype=dtype),
        box=state.box, lam=state.lam, v_lam=state.v_lam, pH=state.pH,
        step=state.step, key=state.key, nhc_xi=state.nhc_xi,
        nhc_lam_xi=state.nhc_lam_xi,
        phi_recip_s=jnp.zeros((Ns,), dtype=dtype),
        metad_v=jnp.zeros((0, 0), dtype=dtype),
        metad_dv=jnp.zeros((0, 0), dtype=dtype),
        ext_work=state.ext_work,
    )


def to_canonical(ts: TiledSystem, tstate: TiledState) -> SystemState:
    """TiledState → canonical SystemState (host-side, boundary only)."""
    n = ts.n_atoms
    x = np.zeros((n, 3))
    v = np.zeros((n, 3))
    wid = np.asarray(tstate.wid)
    wvalid = np.asarray(tstate.wvalid) > 0.5
    wx = np.asarray(tstate.wx)
    wv = np.asarray(tstate.wv)
    G, W = wid.shape
    for c in range(G):
        for s in range(W):
            if not wvalid[c, s]:
                continue
            m = wid[c, s]
            ids = ts.water_atom_ids[m]
            for a in range(3):
                x[ids[a]] = wx[:, c, 3 * s + a]
                v[ids[a]] = wv[:, c, 3 * s + a]
    ns_real = len(ts.solute_ids)
    x[ts.solute_ids] = np.asarray(tstate.sx)[:ns_real]
    v[ts.solute_ids] = np.asarray(tstate.sv)[:ns_real]
    dtype = tstate.sx.dtype
    return SystemState(
        x=jnp.asarray(x, dtype=dtype), v=jnp.asarray(v, dtype=dtype),
        box=tstate.box, lam=tstate.lam, v_lam=tstate.v_lam,
        step=tstate.step, key=tstate.key, pH=tstate.pH,
        nhc_xi=tstate.nhc_xi, nhc_lam_xi=tstate.nhc_lam_xi,
        ext_work=tstate.ext_work,
    )


def pair_chunk_plan(n: int, nseg: int):
    """Chunk plan for merging `nseg` stencil segments of lane width `n`
    into pair blocks: group k segments so each chunk's lane width sits
    just under a multiple of 128 (v5e lane tile). k=1 wastes up to 52% of
    the lanes (n=168→256); one giant merge (k=nseg) has ~0% pad but
    measured ~20% scheduling overhead at n=228 — the mild 3%-per-extra-
    segment penalty reproduces that tradeoff (examples/probe_ww_variants).
    Returns (best_k, modeled_cost). Single source of truth for both the
    merged pair block (tiled/forces.py) and retile_auto's W search."""
    best_k, best_cost = 1, None
    for k in range(1, min(nseg, 8) + 1):
        sizes = [min(k, nseg - s) for s in range(0, nseg, k)]
        padded = sum(-(-sz * n // 128) * 128 for sz in sizes)
        cost = padded * (1.0 + 0.03 * (k - 1))
        if best_cost is None or cost < best_cost:
            best_k, best_cost = k, cost
    return best_k, best_cost


def _pair_cost(W: int, nseg: int = 14) -> float:
    """Padded-lane pair-work model: rows A=3W times the best chunk plan's
    modeled padded-lane total."""
    A = 3 * W
    return A * pair_chunk_plan(A, nseg)[1]


def retile(ts: TiledSystem, tstate: TiledState, W: int):
    """Re-tile with a new per-cell capacity W (host-side, boundary only).

    Pair work scales as (3W)², and equilibrated water has strongly
    sub-Poisson density fluctuations (σ ≈ √(S(0)·⟨N⟩) with S(0) ≈ 0.06),
    so the build-time safety margin needed for arbitrary initial configs is
    ~2× larger than production needs. Measure occupancy after equilibration
    (max over cells of tstate.wvalid.sum(-1)) and retile with
    W = max_occ + margin. Returns (new TiledSystem, new TiledState)."""
    W = max(4, -(-int(W) // 4) * 4)
    state = to_canonical(ts, tstate)
    import copy

    ts2 = copy.copy(ts)
    ts2.params = TileParams(
        grid=ts.params.grid, W=W, half_stencil=ts.params.half_stencil,
        cutoff=ts.params.cutoff, skin=ts.params.skin)
    # retile only re-lays-out water tiles; the per-solute k-space MTS carry
    # and the metadynamics λ-bias tables are layout-independent, so
    # preserve them across the boundary
    return ts2, to_tiled(ts2, state).replace(
        phi_recip_s=tstate.phi_recip_s,
        metad_v=tstate.metad_v, metad_dv=tstate.metad_dv)


def retile_auto(ts: TiledSystem, tstate: TiledState, occ: int,
                *, margin_min: int = 6, margin_max: int = 14):
    """Cost-aware retile: choose W in [occ+margin_min, occ+margin_max]
    minimizing the padded pair-work model (capacity quantizes against the
    128-lane tile, so occ 51 → W=56 (A=168) is ~15% cheaper than W=60
    (A=180) despite only 4 more slots; blind occ+margin rounding loses
    that). Extra slots beyond margin_min only add safety."""
    nseg = len(ts.params.half_stencil) + 1
    w_lo = -(-(occ + margin_min) // 4) * 4      # retile quantizes W to 4s
    best_w, best_c = w_lo, _pair_cost(w_lo, nseg)
    for w in range(w_lo + 4, occ + margin_max + 1, 4):
        c = _pair_cost(w, nseg)
        if c < best_c or (c == best_c and w > best_w):
            best_w, best_c = w, c
    return retile(ts, tstate, best_w)


# ---------------------------------------------------------------------------
# jittable re-binning (runs between scan blocks)
# ---------------------------------------------------------------------------

def rebin(tstate: TiledState, p: TileParams):
    """Re-bin water molecules by current O position. Molecule-level row
    moves only (fast); returns (new_tstate, overflow_flag)."""
    G, W = p.G, p.W
    dtype = tstate.wx.dtype
    grid = jnp.array(p.grid, dtype=jnp.int32)
    gx, gy, gz = p.grid
    box = tstate.box

    # pack per-molecule rows: x(9) + v(9) = (G*W, 18); wid/valid separate
    xm = tstate.wx.reshape(3, G, W, 3).transpose(1, 2, 0, 3).reshape(G * W, 9)
    vm = tstate.wv.reshape(3, G, W, 3).transpose(1, 2, 0, 3).reshape(G * W, 9)
    rows = jnp.concatenate([xm, vm], axis=1)            # (G*W, 18)
    valid = tstate.wvalid.reshape(G * W)
    wid = tstate.wid.reshape(G * W)

    # row layout is (dim, atom)-flattened: [xO xH1 xH2 yO yH1 yH2 zO ...];
    # bin by molecule centroid: PBC-unwrap the satellites into the O image
    # first (a molecule straddling the box seam must not average across it)
    o_only = xm[:, ::3]                                 # (G*W, 3) O coords
    mol = xm.reshape(-1, 3, 3)                          # (G*W, dim, atom)
    rel = mol - o_only[:, :, None]
    rel = rel - box[None, :, None] * jnp.round(rel / box[None, :, None])
    o_pos = o_only + jnp.mean(rel, axis=2)              # centroid
    img = box[None, :] * jnp.floor(o_pos / box[None, :])
    ow = o_pos - img
    # wrap the whole molecule into the box by its centroid image (all three
    # atoms shift together, so rigid geometry and intra-mol differences are
    # untouched); guarantees the fast path's per-cell-shift PBC arithmetic
    rows = rows.at[:, :9].add(-jnp.repeat(img, 3, axis=1))
    cell = (box / jnp.asarray(p.grid, dtype=dtype))[None, :]
    ci = jnp.clip((ow / cell).astype(jnp.int32), 0, grid[None, :] - 1)
    cid = (ci[:, 0] * gy + ci[:, 1]) * gz + ci[:, 2]
    key = jnp.where(valid > 0.5, cid, G)                # invalid sorts last
    order = jnp.argsort(key)
    key_s = key[order]
    first = jnp.searchsorted(key_s, key_s, side="left")
    rank = jnp.arange(G * W, dtype=jnp.int32) - first.astype(jnp.int32)
    # flag one slot EARLY (rank == W-1 fills the last slot): the state is
    # still complete when the flag first trips, so callers can retile to a
    # larger W before any molecule is dropped (rank >= W overwrites slot
    # W-1 and silently loses rows — the flag must precede that)
    overflow = jnp.any((rank >= W - 1) & (key_s < G))
    slot = jnp.clip(rank, 0, W - 1)
    dest = jnp.where(key_s < G, key_s * W + slot, G * W)  # drop invalid

    rows_s = rows[order]                                # row gather (fast)
    park = (PARK_BASE
            + PARK_SPACING * jnp.arange(G * W, dtype=dtype))[:, None]
    park_rows = jnp.concatenate(
        [jnp.broadcast_to(park, (G * W, 9)),
         jnp.zeros((G * W, 9), dtype)], axis=1)
    new_rows = park_rows.at[dest].set(rows_s, mode="drop")
    new_valid = jnp.zeros_like(valid).at[dest].set(
        jnp.ones_like(valid), mode="drop")
    new_wid = jnp.full_like(wid, -1).at[dest].set(wid[order], mode="drop")

    xm2 = new_rows[:, :9].reshape(G, W, 3, 3).transpose(2, 0, 1, 3)
    vm2 = new_rows[:, 9:].reshape(G, W, 3, 3).transpose(2, 0, 1, 3)
    new = tstate.replace(
        wx=xm2.reshape(3, G, 3 * W), wv=vm2.reshape(3, G, 3 * W),
        wvalid=new_valid.reshape(G, W), wid=new_wid.reshape(G, W),
    )
    return new, overflow
