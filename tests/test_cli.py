"""CLI round-trip: state netCDF + obs CSV in, posterior netCDF + stats out.

The reference has no CLI (and its setup.py cannot install); this covers the
framework's scheduler-facing entry point end to end on both solvers.
"""

import csv

import numpy as np
import pytest

from conftest import make_demo_state
from efa_xray_tpu import cli
from efa_xray_tpu.state.ensemble import EnsembleState
from efa_xray_tpu.utils import timeutil


def _write_obs_csv(path, state, nobs=6, seed=3, radius=1500.0):
    rng = np.random.default_rng(seed)
    s = state.structure
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["value", "lat", "lon", "time", "obtype", "error",
                    "radius", "assimilate", "description"])
        for i in range(nobs):
            t = timeutil.to_datetime64(int(s.times_s[i % s.ntimes]))
            w.writerow([
                f"{280.0 + rng.normal(0, 2):.3f}",
                f"{rng.uniform(s.lat.min() + 0.5, s.lat.max() - 0.5):.4f}",
                f"{rng.uniform(s.lon.min() + 0.5, s.lon.max() - 0.5):.4f}",
                str(t),
                s.var_names[0],
                "1.0",
                "" if i == 0 else str(radius),  # blank radius -> --radius default
                "1" if i != 1 else "0",  # one QC'd-out ob
                f"ob-{i}",
            ])


@pytest.mark.parametrize("solver", ["ensrf", "letkf"])
def test_cli_assimilate_round_trip(tmp_path, solver, capsys):
    state = make_demo_state(ny=6, nx=8, nmems=16, seed=8)
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))
    obs_csv = tmp_path / "obs.csv"
    _write_obs_csv(str(obs_csv), state)
    out_nc = tmp_path / "post.nc"
    stats_csv = tmp_path / "stats.csv"

    rc = cli.main([
        "assimilate", "--state", str(prior_nc), "--obs", str(obs_csv),
        "--out", str(out_nc), "--stats", str(stats_csv),
        "--solver", solver, "--inflation", "1.05", "--radius", "2000",
        "--dtype", "float64",
    ])
    assert rc == 0
    printed = capsys.readouterr().out
    assert "assimilated 5/6 obs" in printed

    post = EnsembleState.from_netcdf(str(out_nc))
    assert post.data.shape == state.data.shape
    assert not np.allclose(np.asarray(post.data), np.asarray(state.data))

    with open(stats_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 6
    vals = np.array([float(r["value"]) for r in rows])
    pm = np.array([float(r["prior mean"]) for r in rows])
    # "post mean" re-applies H to the posterior for EVERY ob (reference
    # postprocess semantics), so it is finite even for the QC'd-out ob.
    om = np.array([float(r["post mean"]) for r in rows])
    assim = np.array([r["assimilated"] == "True" for r in rows])
    assert assim.sum() == 5
    ok = assim
    assert (np.abs(vals[ok] - om[ok]) <= np.abs(vals[ok] - pm[ok]) + 1e-9).mean() > 0.5


def test_cli_rtpp_restores_prior_spread(tmp_path, capsys):
    state = make_demo_state(ny=6, nx=8, nmems=16, seed=8)
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))
    obs_csv = tmp_path / "obs.csv"
    _write_obs_csv(str(obs_csv), state)
    out_nc = tmp_path / "post.nc"

    rc = cli.main([
        "assimilate", "--state", str(prior_nc), "--obs", str(obs_csv),
        "--out", str(out_nc), "--radius", "2000", "--dtype", "float64",
        "--rtpp", "1.0",
    ])
    assert rc == 0
    post = EnsembleState.from_netcdf(str(out_nc))
    # alpha=1 RTPP: posterior perturbations == prior perturbations
    np.testing.assert_allclose(
        np.asarray(post.ensemble_perts().to_vect()),
        np.asarray(state.ensemble_perts().to_vect()),
        atol=1e-9,
    )
    # but the mean moved (obs were assimilated)
    assert not np.allclose(
        np.asarray(post.ensemble_mean()), np.asarray(state.ensemble_mean())
    )


def test_cli_info(tmp_path, capsys):
    state = make_demo_state(ny=5, nx=7, nmems=10)
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))
    rc = cli.main(["info", "--state", str(prior_nc)])
    assert rc == 0
    out = capsys.readouterr().out
    assert "T2m" in out and "members    : 10" in out


def test_cli_rejects_malformed_obs(tmp_path):
    state = make_demo_state(ny=5, nx=7, nmems=10)
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))
    bad = tmp_path / "bad.csv"
    bad.write_text("foo,bar\n1,2\n")
    with pytest.raises(SystemExit):
        cli.main(["assimilate", "--state", str(prior_nc), "--obs", str(bad),
                  "--out", str(tmp_path / "x.nc")])


def test_cli_nc_obs_enkf_and_obs_out(tmp_path, capsys):
    """netCDF obs input + EnKF solver + posterior-obs output + spatial sort."""
    from conftest import make_demo_obs
    from efa_xray_tpu.observation.observation import ObservationBatch
    from efa_xray_tpu.utils import ncio

    state = make_demo_state(nmems=10, seed=4)
    state.save_to_disk(str(tmp_path / "prior.nc"))
    batch = ObservationBatch.coerce(make_demo_obs(state, nobs=7, seed=5,
                                                  radius=900.0))
    ncio.write_obs(str(tmp_path / "obs.nc"), batch)

    rc = cli.main([
        "assimilate",
        "--state", str(tmp_path / "prior.nc"),
        "--obs", str(tmp_path / "obs.nc"),
        "--out", str(tmp_path / "post.nc"),
        "--obs-out", str(tmp_path / "obs_post.nc"),
        "--solver", "enkf", "--seed", "3", "--sort-spatial",
        "--dtype", "float64",
    ])
    assert rc == 0
    assert "assimilated" in capsys.readouterr().out
    post = ncio.read_state(str(tmp_path / "post.nc"))
    assert post.data.shape == state.data.shape
    back = ncio.read_obs(str(tmp_path / "obs_post.nc"))
    assert back.post_mean is not None and np.isfinite(back.post_mean).all()


def test_cli_verify_subcommand(tmp_path, capsys):
    """assimilate -> verify pipeline: the verify subcommand consumes the
    prior/posterior pair + the posterior obs file and prints the
    verification battery (obs-space RMSE, CRPS, rank histogram,
    Desroziers table)."""
    state = make_demo_state(ny=6, nx=8, nmems=16, seed=8)
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))
    obs_csv = tmp_path / "obs.csv"
    _write_obs_csv(str(obs_csv), state, nobs=8)
    rc = cli.main([
        "assimilate", "--state", str(prior_nc), "--obs", str(obs_csv),
        "--out", str(tmp_path / "post.nc"),
        "--obs-out", str(tmp_path / "obs_post.nc"),
        "--radius", "2000", "--dtype", "float64",
    ])
    assert rc == 0
    capsys.readouterr()

    rc = cli.main([
        "verify", "--prior", str(prior_nc),
        "--post", str(tmp_path / "post.nc"),
        "--obs", str(tmp_path / "obs_post.nc"),
        "--stats", str(tmp_path / "verify.csv"),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "obs-space RMSE prior=" in out
    assert "CRPS prior=" in out
    assert "rank histogram" in out
    assert "Desroziers" in out
    # posterior must fit the obs at least as well as the prior
    import re

    m = re.search(r"RMSE prior=([\d.eE+-]+) posterior=([\d.eE+-]+)", out)
    assert float(m.group(2)) <= float(m.group(1)) + 1e-12
    m = re.search(r"CRPS prior=([\d.eE+-]+) posterior=([\d.eE+-]+)", out)
    assert float(m.group(2)) <= float(m.group(1)) + 1e-12
    with open(tmp_path / "verify.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 8

    # raw-CSV obs path: falls back to assimilate_this flags with a note
    rc = cli.main([
        "verify", "--prior", str(prior_nc),
        "--post", str(tmp_path / "post.nc"), "--obs", str(obs_csv),
    ])
    assert rc == 0
    assert "using the assimilate_this flags" in capsys.readouterr().out


def test_cli_method_serial_matches_blocked(tmp_path, capsys):
    """--method picks the execution path without changing the analysis
    (blocked and serial are algebraically identical at float64)."""
    state = make_demo_state(ny=6, nx=8, nmems=16, seed=9)
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))
    obs_csv = tmp_path / "obs.csv"
    _write_obs_csv(str(obs_csv), state)

    outs = {}
    for method in ("blocked", "serial"):
        out_nc = tmp_path / f"post_{method}.nc"
        rc = cli.main([
            "assimilate", "--state", str(prior_nc), "--obs", str(obs_csv),
            "--out", str(out_nc), "--radius", "2000",
            "--dtype", "float64", "--method", method,
        ])
        assert rc == 0
        outs[method] = np.asarray(EnsembleState.from_netcdf(str(out_nc)).data)
    np.testing.assert_allclose(outs["serial"], outs["blocked"],
                               atol=1e-9, rtol=0)


def test_cli_target_rank_and_greedy(tmp_path, capsys):
    """`target` scores a candidate CSV (rank mode) and designs a greedy
    network (--nselect), writing both tables; greedy's first pick is the
    rank-mode argmin of predicted dVar(J)."""
    import pandas as pd

    state = make_demo_state(ny=8, nx=10, nmems=18, seed=21)
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))
    obs_csv = tmp_path / "cands.csv"
    _write_obs_csv(str(obs_csv), state, nobs=15, seed=22)

    rank_csv = tmp_path / "rank.csv"
    rc = cli.main([
        "target", "--state", str(prior_nc), "--obs", str(obs_csv),
        "--out", str(rank_csv), "--metric-time-index", "-1",
    ])
    assert rc == 0
    rank = pd.read_csv(rank_csv)
    assert {"dJ_mean_pred", "dJ_var_pred", "qc_ok"} <= set(rank.columns)
    assert len(rank) == 15

    net_csv = tmp_path / "net.csv"
    rc = cli.main([
        "target", "--state", str(prior_nc), "--obs", str(obs_csv),
        "--out", str(net_csv), "--metric-time-index", "-1",
        "--nselect", "3",
    ])
    assert rc == 0
    net = pd.read_csv(net_csv)
    assert len(net) == 3 and net["candidate"].is_unique
    assert int(net["candidate"].iloc[0]) == int(rank["dJ_var_pred"].idxmin())
    out = capsys.readouterr().out
    assert "greedy network" in out


def test_cli_var_loc_flag(tmp_path):
    """--var-loc T0:T1=0 keeps variable T1 bitwise at its prior while T0
    updates (the cross-variable localization CLI surface)."""
    state = make_demo_state(nvars=2, ny=6, nx=8, nmems=14, seed=31)
    names = state.structure.var_names
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))
    obs_csv = tmp_path / "obs.csv"
    _write_obs_csv(str(obs_csv), state, nobs=8, seed=32)
    # _write_obs_csv alternates obtypes; force all to var 0 for isolation
    import pandas as pd

    df = pd.read_csv(obs_csv)
    df["obtype"] = names[0]
    df["assimilate"] = 1
    df.to_csv(obs_csv, index=False)
    out_nc = tmp_path / "post.nc"
    rc = cli.main([
        "assimilate", "--state", str(prior_nc), "--obs", str(obs_csv),
        "--out", str(out_nc), "--radius", "2000", "--dtype", "float64",
        "--var-loc", f"{names[0]}:{names[1]}=0.0",
    ])
    assert rc == 0
    post = EnsembleState.from_netcdf(str(out_nc))
    prior = np.asarray(state.data)
    got = np.asarray(post.data)
    np.testing.assert_array_equal(got[1], prior[1])
    assert np.abs(got[0] - prior[0]).max() > 1e-8
    with pytest.raises(SystemExit):
        cli.main(["assimilate", "--state", str(prior_nc), "--obs",
                  str(obs_csv), "--out", str(out_nc), "--var-loc", "junk"])
