"""LAMMPS data-file IO: write → read (native C++ and Python parsers) →
energy parity with the original system."""
import numpy as np
import jax.numpy as jnp
import pytest

from constant_ph_tpu.engine import EngineConfig
from constant_ph_tpu.systems import lammps_data as ld
from constant_ph_tpu.systems.water import solvated_acid


@pytest.fixture(scope="module")
def roundtrip(tmp_path_factory):
    sys_ = solvated_acid(n_side=3, rigid_water=False, cutoff=4.5,
                         coul_style="dsf", alpha=0.2, seed=4)
    path = str(tmp_path_factory.mktemp("ld") / "system.data")
    ld.write_lammps_data(path, sys_)
    return sys_, path


def _energy(system):
    eng = system.make_engine(EngineConfig(rebuild_every=10))
    nbr = eng.build_neighbors(system.state.x, system.state.box)
    frc = eng.compute_forces(system.state.x, system.state.lam,
                             system.state.box, system.state.pH, nbr)
    return (float(frc.e_lj), float(frc.e_coul), float(frc.e_bonded))


def test_python_parser_roundtrip(roundtrip):
    sys_, path = roundtrip
    raw = ld._read_python(path)
    np.testing.assert_allclose(raw["x"], np.asarray(sys_.state.x), atol=1e-6)
    np.testing.assert_allclose(raw["q"], np.asarray(sys_.ff.q0), atol=1e-6)
    assert raw["bonds"].shape[0] == int(sys_.bonded.bond_idx.shape[0])


def test_native_parser_matches_python(roundtrip):
    sys_, path = roundtrip
    native = ld._read_native(path)
    if native is None:
        pytest.skip("no C++ toolchain")
    python = ld._read_python(path)
    for key in ("x", "v", "q", "type", "mass_by_type", "pair_eps",
                "pair_sig", "bonds", "angles", "box"):
        np.testing.assert_allclose(
            np.asarray(native[key], dtype=float),
            np.asarray(python[key], dtype=float),
            atol=1e-8, err_msg=key)


def test_roundtrip_energy_parity(roundtrip):
    import dataclasses

    sys_, path = roundtrip
    sys2 = ld.system_from_lammps_data(
        path, cutoff=4.5, coul_style="dsf", alpha=0.2)
    # reloaded system has no λ sites → compare at λ=0 (base charge set)
    sys0 = dataclasses.replace(
        sys_, state=sys_.state.replace(lam=jnp.zeros_like(sys_.state.lam)))
    e1 = _energy(sys0)
    e2 = _energy(sys2)
    np.testing.assert_allclose(e2, e1, rtol=2e-4, atol=1e-3)


def test_reexport_preserves_rigid_water(tmp_path):
    """Deck-read system → write → read again must keep the same bond count
    and still detect the rigid-water constraints (regression: constraint-
    derived masked spring rows used to be re-exported alongside the rows
    re-added from triplets, duplicating every O-H bond and silently turning
    rigid water into unmasked 450-kcal springs on the second read)."""
    sys_ = solvated_acid(n_side=3, rigid_water=True, cutoff=4.5,
                         coul_style="dsf", alpha=0.2, seed=4)
    trip0 = np.asarray(sys_.constraints.triplets)[0]
    types = np.asarray(sys_.ff.type)
    rwt = (int(types[trip0[0]]) + 1, int(types[trip0[1]]) + 1)
    p1 = str(tmp_path / "a.data")
    ld.write_lammps_data(p1, sys_)
    sys2 = ld.system_from_lammps_data(
        p1, cutoff=4.5, coul_style="dsf", alpha=0.2,
        rigid_water_types=rwt)
    assert sys2.constraints is not None
    p2 = str(tmp_path / "b.data")
    ld.write_lammps_data(p2, sys2)
    sys3 = ld.system_from_lammps_data(
        p2, cutoff=4.5, coul_style="dsf", alpha=0.2,
        rigid_water_types=rwt)
    assert sys3.constraints is not None
    assert (sys3.constraints.triplets.shape ==
            sys2.constraints.triplets.shape)
    assert (sys3.bonded.bond_idx.shape[0] ==
            sys2.bonded.bond_idx.shape[0])
    # constraint-derived springs stay masked out of the bonded forces
    np.testing.assert_allclose(np.asarray(sys3.bonded.bond_mask).sum(),
                               np.asarray(sys2.bonded.bond_mask).sum())


def test_native_exclusion_builder():
    from constant_ph_tpu.forcefield import build_exclusions
    from constant_ph_tpu.native.build import load_library

    lib = load_library("topology")
    if lib is None:
        pytest.skip("no C++ toolchain")
    import ctypes

    rng = np.random.default_rng(0)
    n = 200
    bonds = []
    # random chain + branches
    for i in range(1, n):
        bonds.append((i - 1, i))
        if i % 7 == 0 and i + 3 < n:
            bonds.append((i, i + 3))
    bonds = np.asarray(bonds, dtype=np.int64)
    want_idx, want_code = build_exclusions(n, bonds, max_excl=32)

    max_excl = 32
    excl_idx = np.full((n, max_excl), -1, dtype=np.int64)
    excl_code = np.zeros((n, max_excl), dtype=np.int64)
    lib.build_exclusions.restype = ctypes.c_int64
    ret = lib.build_exclusions(
        ctypes.c_int64(n), ctypes.c_int64(len(bonds)),
        bonds.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(max_excl),
        excl_idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        excl_code.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    assert ret == 0
    # same SETS per atom/code (ordering may differ)
    for i in range(n):
        for code in (1, 2, 3):
            a = set(want_idx[i][want_code[i] == code].tolist())
            b = set(excl_idx[i][excl_code[i] == code].tolist())
            assert a == b, (i, code, a, b)


class TestDeckFuzz:
    """Robustness to the host input world (fix_constant_pH.cpp:15-25):
    benign deck mutations must parse to the same physics; mutations the
    reader cannot represent must be NAMED errors, never silent
    mis-parses (VERDICT r4 item 9)."""

    def _mutate(self, path, tmp_path, fn, name):
        out = str(tmp_path / f"{name}.data")
        open(out, "w").write(fn(open(path).read()))
        return out

    def test_reordered_sections_and_comments(self, roundtrip, tmp_path):
        sys_, path = roundtrip
        text = open(path).read()
        lines = text.splitlines()
        # split into (header, sections) and emit sections reversed with
        # injected comments/blank lines
        import re
        first_sec = next(i for i, l in enumerate(lines[1:], 1)
                         if re.match(r"^[A-Za-z]", l.split("#")[0].strip()))
        head, body = lines[:first_sec], lines[first_sec:]
        secs, cur = [], []
        for l in body:
            if re.match(r"^[A-Za-z]", l.split("#")[0].strip()) and cur:
                secs.append(cur)
                cur = [l]
            else:
                cur.append(l)
        secs.append(cur)
        shuffled = head + ["# injected comment"]
        for s in reversed(secs):
            shuffled += s + ["", "# another comment"]
        out = str(tmp_path / "reordered.data")
        open(out, "w").write("\n".join(shuffled) + "\n")
        a = ld.read_lammps_data(path)
        b = ld.read_lammps_data(out)
        np.testing.assert_allclose(b["x"], a["x"])
        np.testing.assert_allclose(b["q"], a["q"])
        np.testing.assert_array_equal(b["bonds"], a["bonds"])

    def test_unknown_atom_style_raises(self, roundtrip, tmp_path):
        _, path = roundtrip
        out = self._mutate(path, tmp_path,
                           lambda t: t.replace("Atoms # full",
                                               "Atoms # molecular")
                                      .replace("Atoms # charge",
                                               "Atoms # molecular"),
                           "style")
        with pytest.raises(ValueError, match="style 'molecular'"):
            ld.read_lammps_data(out)

    def test_triclinic_tilt_raises(self, roundtrip, tmp_path):
        _, path = roundtrip
        out = self._mutate(
            path, tmp_path,
            lambda t: t.replace(
                "zlo zhi", "zlo zhi\n2.5 0.0 0.0 xy xz yz"), "tilt")
        with pytest.raises(ValueError, match="triclinic"):
            ld.read_lammps_data(out)
        # ZERO tilt is orthorhombic spelled differently — must parse
        out0 = self._mutate(
            path, tmp_path,
            lambda t: t.replace(
                "zlo zhi", "zlo zhi\n0.0 0.0 0.0 xy xz yz"), "tilt0")
        ld.read_lammps_data(out0)

    def test_unknown_section_raises(self, roundtrip, tmp_path):
        _, path = roundtrip
        out = self._mutate(path, tmp_path,
                           lambda t: t + "\nPairIJ Coeffs\n\n1 1 0.1 3.0\n",
                           "pairij")
        with pytest.raises(ValueError, match="unknown data-file section"):
            ld.read_lammps_data(out)
