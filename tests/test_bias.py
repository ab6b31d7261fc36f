"""Per-obtype observation bias estimation/correction (`observation/bias.py`).

Extension beyond the reference (which takes every ob value at face value,
``efa_xray/assimilation/ensrf.py:86``): an EMA estimator of the per-obtype
mean prior innovation, subtracted from ob values before assimilation.
Contract under test:

* EMA mechanics: first sighting starts at the sample mean, later updates
  blend at rate alpha; below-min_count types and excluded obs (assimilate
  False, QC outliers, non-finite innovations) never move the estimate;
* ``correct`` subtracts the estimate, leaves the input batch unmodified
  and unknown types untouched;
* JSON persistence round-trips;
* end-to-end: with obs manufactured at a known constant offset from the
  ensemble estimate, the estimator recovers the offset across cycles and
  the corrected assimilation moves the state less than the uncorrected
  one (the bias no longer masquerades as signal).
"""

import numpy as np
import pytest

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.assimilation.ensrf import EnSRF
from efa_xray_tpu.config import FilterConfig
from efa_xray_tpu.observation.bias import BiasCorrection
from efa_xray_tpu.observation.observation import ObservationBatch


def _batch(values, obtypes, prior_mean, assim=None, qc=None):
    n = len(values)
    b = ObservationBatch(
        values=np.asarray(values, dtype=np.float64),
        errors=np.ones(n),
        lats=np.zeros(n),
        lons=np.zeros(n),
        times_s=np.zeros(n, dtype=np.int64),
        obtypes=list(obtypes),
        localize_radius=np.full(n, np.inf),
        assimilate_flags=(
            np.ones(n, dtype=bool) if assim is None else np.asarray(assim)
        ),
        verts=np.full(n, np.nan),
        descriptions=[None] * n,
    )
    b.prior_mean = np.asarray(prior_mean, dtype=np.float64)
    if qc is not None:
        b.qc_outlier = np.asarray(qc, dtype=bool)
    return b


def test_first_update_starts_at_sample_mean():
    bc = BiasCorrection(alpha=0.25)
    b = _batch([281.0, 283.0], ["T", "T"], [280.0, 280.0])
    sample = bc.update(b)
    assert sample == {"T": pytest.approx(2.0)}
    assert bc.offset_for("T") == pytest.approx(2.0)
    assert bc.counts["T"] == 2


def test_ema_blends_at_alpha():
    bc = BiasCorrection(alpha=0.25, biases={"T": 2.0}, counts={"T": 4})
    b = _batch([286.0, 286.0], ["T", "T"], [280.0, 280.0])  # sample mean 6
    bc.update(b)
    assert bc.offset_for("T") == pytest.approx(0.75 * 2.0 + 0.25 * 6.0)
    assert bc.counts["T"] == 6


def test_exclusions_and_min_count():
    bc = BiasCorrection(alpha=1.0, min_count=2)
    # "T": one usable ob (other is assimilate=False) -> below min_count
    # "Q": one QC outlier + one NaN innovation -> zero usable
    b = _batch(
        [285.0, 285.0, 290.0, 285.0],
        ["T", "T", "Q", "Q"],
        [280.0, 280.0, 280.0, np.nan],
        assim=[True, False, True, True],
        qc=[False, False, True, False],
    )
    sample = bc.update(b)
    assert sample == {}
    assert bc.biases == {} and bc.counts == {}
    # unknown types correct to a no-op
    c = bc.correct(b)
    np.testing.assert_array_equal(c.values, b.values)


def test_correct_subtracts_and_preserves_input():
    bc = BiasCorrection(biases={"T": 1.5}, counts={"T": 10})
    b = _batch([281.0, 282.0, 283.0], ["T", "U", "T"], [0.0, 0.0, 0.0])
    before = b.values.copy()
    c = bc.correct(b)
    np.testing.assert_allclose(c.values, [279.5, 282.0, 281.5])
    np.testing.assert_array_equal(b.values, before)  # input untouched
    # everything else carried over
    assert c.obtypes == b.obtypes
    np.testing.assert_array_equal(c.errors, b.errors)


def test_json_roundtrip(tmp_path):
    bc = BiasCorrection(alpha=0.3, min_count=3,
                        biases={"T": 1.25, "Q": -0.5},
                        counts={"T": 40, "Q": 12})
    path = str(tmp_path / "bias.json")
    bc.save(path)
    back = BiasCorrection.load(path)
    assert back == bc


def test_validation():
    with pytest.raises(ValueError):
        BiasCorrection(alpha=0.0)
    with pytest.raises(ValueError):
        BiasCorrection(alpha=1.5)
    with pytest.raises(ValueError):
        BiasCorrection(min_count=0)
    no_prior = _batch([1.0], ["T"], [0.0])
    no_prior.prior_mean = None
    with pytest.raises(ValueError):
        BiasCorrection().update(no_prior)


def _biased_obs(state, bias, nobs=12, seed=3, noise=0.05, radius=2000.0):
    """Obs manufactured AT the ensemble estimate + bias (+ tiny noise), so
    the true innovation is the bias itself."""
    obs = make_demo_obs(state, nobs=nobs, seed=seed, radius=radius)
    rng = np.random.default_rng(seed + 100)
    probe = EnSRF(state, obs, verbose=False,
                  config=FilterConfig(dtype="float64"))
    tm, _ = probe.compute_ob_priors()
    tm = np.asarray(tm, dtype=np.float64)
    for i, ob in enumerate(obs):
        ob.value = float(tm[i] + bias + rng.normal(0.0, noise))
    return obs


def test_estimator_recovers_known_bias_over_cycles():
    """O-B estimation (value minus FORECAST-prior ensemble estimate, the
    operational convention) converges to the manufactured constant bias."""
    true_bias = 2.0
    state = make_demo_state()
    bc = BiasCorrection(alpha=0.5)
    for cycle in range(4):
        obs = _biased_obs(state, true_bias, seed=3 + cycle)
        batch = ObservationBatch.from_observations(obs)
        filt = EnSRF(state, batch, verbose=False,
                     config=FilterConfig(dtype="float64"))
        tm, _ = filt.compute_ob_priors()
        batch.prior_mean = np.asarray(tm, dtype=np.float64)
        bc.update(batch)
    assert bc.offset_for("T2m") == pytest.approx(true_bias, abs=0.1)


def test_corrected_assimilation_moves_state_less():
    true_bias = 2.0
    state = make_demo_state()
    obs = _biased_obs(state, true_bias)
    batch = ObservationBatch.from_observations(obs)
    cfg = FilterConfig(dtype="float64")

    post_raw, _ = EnSRF(state, batch, verbose=False, config=cfg).update()

    bc = BiasCorrection(biases={"T2m": true_bias}, counts={"T2m": 1})
    post_fix, _ = EnSRF(
        state, bc.correct(batch), verbose=False, config=cfg
    ).update()

    # Compare ensemble MEANS: the mean moves only with the innovation,
    # while member perturbations contract identically in both runs.
    prior_mean = np.asarray(state.ensemble_mean(), dtype=np.float64)
    d_raw = np.abs(np.asarray(post_raw.ensemble_mean()) - prior_mean).max()
    d_fix = np.abs(np.asarray(post_fix.ensemble_mean()) - prior_mean).max()
    # corrected innovations are ~noise, so the mean pull collapses
    assert d_fix < 0.2 * d_raw


def test_cli_bias_file_cycles(tmp_path, capsys):
    """--bias-file: first invocation learns the O-B offset and saves it;
    a second invocation loads it, so the corrected innovations (and the
    posterior mean pull) collapse."""
    import csv

    from efa_xray_tpu import cli
    from efa_xray_tpu.utils import timeutil

    true_bias = 3.0
    state = make_demo_state(ny=6, nx=8, nmems=16, seed=8)
    prior_nc = tmp_path / "prior.nc"
    state.save_to_disk(str(prior_nc))

    # obs AT the interpolated forecast estimate + bias (near-zero noise)
    obs = _biased_obs(state, true_bias, nobs=8, seed=7, noise=0.01)
    obs_csv = tmp_path / "obs.csv"
    with open(obs_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["value", "lat", "lon", "time", "obtype", "error"])
        for ob in obs:
            w.writerow([f"{ob.value:.5f}", f"{ob.lat:.5f}", f"{ob.lon:.5f}",
                        str(timeutil.to_datetime64(
                            timeutil.to_epoch_seconds([ob.time])[0])),
                        ob.obtype, "1.0"])

    bias_json = tmp_path / "bias.json"
    common = ["assimilate", "--state", str(prior_nc), "--obs", str(obs_csv),
              "--radius", "2000", "--dtype", "float64",
              "--bias-file", str(bias_json), "--bias-alpha", "0.5"]

    rc = cli.main(common + ["--out", str(tmp_path / "post1.nc")])
    assert rc == 0
    assert "bias correction: T2m=" in capsys.readouterr().out

    bc = BiasCorrection.load(str(bias_json))
    # first sighting = the full sample-mean O-B
    assert bc.offset_for("T2m") == pytest.approx(true_bias, abs=0.05)

    # second cycle: the loaded estimate corrects the obs, so the posterior
    # mean barely moves
    rc = cli.main(common + ["--out", str(tmp_path / "post2.nc")])
    assert rc == 0
    from efa_xray_tpu.state.ensemble import EnsembleState

    post2 = EnsembleState.from_netcdf(str(tmp_path / "post2.nc"),
                                      dtype="float64")
    pm = np.asarray(state.ensemble_mean(), dtype=np.float64)
    d2 = np.abs(np.asarray(post2.ensemble_mean()) - pm).max()
    post_raw, _ = EnSRF(
        state, ObservationBatch.from_observations(obs), verbose=False,
        config=FilterConfig(dtype="float64"),
    ).update()
    d_raw = np.abs(np.asarray(post_raw.ensemble_mean()) - pm).max()
    assert d2 < 0.2 * d_raw
