"""CLI smoke tests (the layer-D user surface)."""
import json
import os

import numpy as np
import pytest

from constant_ph_tpu.cli import main


def _write_cfg(tmp_path, tiled):
    cfg = {
        "system": {
            "builder": "solvated_acid",
            "n_side": 3, "pH": 5.0, "pK": 4.25, "cutoff": 4.5,
            "coul_style": "dsf", "alpha": 0.2, "rigid_water": True,
        },
        "engine": {
            "dt": 1.0, "thermostat": "langevin", "T": 300.0,
            "gamma": 0.01, "lambda_thermostat": "langevin",
            "rebuild_every": 5,
        },
        "run": {
            "steps": 40, "minimize_steps": 20, "observe_every": 10,
            "tiled": tiled,
            "checkpoint": str(tmp_path / "ck.npz"),
            "output": str(tmp_path / "obs.jsonl"),
        },
    }
    p = str(tmp_path / "cfg.json")
    with open(p, "w") as fh:
        json.dump(cfg, fh)
    return p


@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.acceptance
def test_cli_run(tmp_path, capsys, tiled):
    p = _write_cfg(tmp_path, tiled)
    main(["run", p])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["steps"] == 40
    assert np.isfinite(summary["e_pot"])
    assert os.path.exists(str(tmp_path / "ck.npz"))
    lines = open(str(tmp_path / "obs.jsonl")).read().strip().splitlines()
    assert len(lines) == 4


@pytest.mark.acceptance
def test_cli_run_pme(tmp_path, capsys):
    """kspace style 'pme' end-to-end through the CLI tiled path."""
    p = _write_cfg(tmp_path, True)
    cfg = json.load(open(p))
    cfg["kspace"] = {"style": "pme", "alpha": 0.3, "spacing": 1.5, "p": 4}
    json.dump(cfg, open(p, "w"))
    main(["run", p])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["steps"] == 40
    assert np.isfinite(summary["e_pot"])


@pytest.mark.acceptance
def test_cli_run_trajectory(tmp_path, capsys):
    """run.trajectory writes a readable DCD with the right frame count."""
    from constant_ph_tpu.trajectory import read_dcd

    p = _write_cfg(tmp_path, True)
    cfg = json.load(open(p))
    cfg["run"]["trajectory"] = str(tmp_path / "t.dcd")
    cfg["run"]["traj_every"] = 10
    json.dump(cfg, open(p, "w"))
    main(["run", p])
    frames, _meta = read_dcd(str(tmp_path / "t.dcd"))
    assert len(frames) == 4          # 40 steps / 10
    assert np.all(np.isfinite(frames[-1]))


@pytest.mark.acceptance
def test_cli_run_npt(tmp_path, capsys):
    """run.pressure switches the tiled production loop to the MC-barostat
    NPT driver (tiled/npt.py); kspace + pressure must refuse."""
    p = _write_cfg(tmp_path, True)
    cfg = json.load(open(p))
    cfg["run"]["pressure"] = 1.0
    cfg["run"]["steps"] = 30
    json.dump(cfg, open(p, "w"))
    main(["run", p])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert np.isfinite(summary["e_pot"])

    cfg["kspace"] = {"style": "pme", "alpha": 0.3, "spacing": 1.5, "p": 4}
    json.dump(cfg, open(p, "w"))
    with pytest.raises(ValueError, match="NPT"):
        main(["run", p])


def test_cli_titrate(tmp_path, capsys):
    p = _write_cfg(tmp_path, False)
    main(["titrate", p, "--ph", "4.0,5.0"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["pH"] == [4.0, 5.0]
    assert len(out["deprotonated_fraction"]) == 2


@pytest.mark.acceptance
def test_cli_titrate_metad(tmp_path, capsys):
    """--method metad: vmapped λ-metadynamics walkers through the tiled
    engine; smoke-level (estimator convergence is tests/test_metad.py's
    job) — shapes, finiteness, and per-site output."""
    p = _write_cfg(tmp_path, True)
    cfg = json.load(open(p))
    cfg["run"]["steps"] = 300
    cfg["metad"] = {"nbins": 61, "sigma": 0.05, "h0": 0.5, "gamma": 8.0}
    json.dump(cfg, open(p, "w"))
    main(["titrate", p, "--ph", "3.0,6.0", "--method", "metad"])
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["method"] == "metad"
    assert len(out["per_site"]) == 2
    assert np.isfinite(np.asarray(out["per_site"])).all()


@pytest.mark.acceptance
def test_cli_calibrate_metad_refuses_undersampled(tmp_path):
    """A 400-step metad calibration cannot legitimately cross the λ
    barrier; the CLI must surface the named never-crossed error instead
    of printing a silent garbage constant (the round-4 failure mode:
    13/20 sites at −inf from the soft protocol). The happy path is
    covered at the library level (tests/test_metad.py::
    test_metad_per_site_calibration_uncoupled)."""
    import pytest

    p = _write_cfg(tmp_path, True)
    with pytest.raises(RuntimeError, match="never crossed"):
        main(["calibrate", p, "--equil", "20", "--samples", "400",
              "--method", "metad"])


@pytest.mark.acceptance
def test_cli_run_lammps_deck(tmp_path, capsys):
    """Deck-driven run through the CLI: builder 'lammps_data' reads a
    LAMMPS data file + λ-site sidecar (the reference's complete input
    pathway: data file for the host, fix command line → sidecar)."""
    from constant_ph_tpu.systems.lammps_data import (write_lammps_data,
                                                     write_sites_json)
    from constant_ph_tpu.systems.water import solvated_acid

    src = solvated_acid(n_side=3, pH=5.0, pK=4.25, cutoff=4.5,
                        coul_style="dsf", alpha=0.2, rigid_water=True)
    deck = str(tmp_path / "acid.data")
    sidecar = str(tmp_path / "acid.sites.json")
    write_lammps_data(deck, src)
    write_sites_json(sidecar, src)
    cfg = {
        "system": {
            "builder": "lammps_data", "path": deck, "sites_json": sidecar,
            # solvated_acid types: 5=O_wat, 6=H_wat (1-based in the deck)
            "rigid_water_types": [5, 6],
            "cutoff": 4.5, "coul_style": "dsf", "alpha": 0.2, "pH": 5.0,
        },
        "engine": {
            "dt": 1.0, "thermostat": "langevin", "T": 300.0,
            "gamma": 0.01, "lambda_thermostat": "langevin",
            "rebuild_every": 5,
        },
        "run": {"steps": 20, "minimize_steps": 20, "observe_every": 10,
                "tiled": True},
    }
    p = str(tmp_path / "deck_cfg.json")
    with open(p, "w") as fh:
        json.dump(cfg, fh)
    main(["run", p])
    out = capsys.readouterr().out.strip().splitlines()[-1]
    summary = json.loads(out)
    assert summary["steps"] == 20
    assert np.isfinite(summary["e_pot"])
