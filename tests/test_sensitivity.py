"""Ensemble sensitivity analysis + observation-impact prediction
(postprocess/sensitivity.py; extensions beyond the reference — Torn &
Hakim 2008 ESA and Ancell & Hakim 2007 observation impact, the standard
companions of the EFA workflow in Madaus & Hakim 2015)."""

import numpy as np
import pytest

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.assimilation.ensrf import EnSRF
from efa_xray_tpu.config import FilterConfig
from efa_xray_tpu.observation.observation import Observation
from efa_xray_tpu.postprocess.sensitivity import (
    ensemble_sensitivity,
    metric_values,
    observation_impact,
    region_mean_metric,
)
from efa_xray_tpu.utils import timeutil


def test_linear_metric_exact_recovery():
    """J = 2 * x_at_one_point + 5: the regression slope AT that point is
    exactly 2, the correlation exactly 1, and significance fires."""
    state = make_demo_state(ntimes=2, ny=5, nx=7, nmems=25, seed=0)
    data = np.asarray(state.data)  # [V, T, Y, X, M]
    j = 2.0 * data[0, 1, 2, 3, :] + 5.0
    out = ensemble_sensitivity(state, j, confidence=0.95)
    f = out[state.structure.var_names[0]]
    assert f["sensitivity"].shape == (2, 5, 7)
    np.testing.assert_allclose(f["sensitivity"][1, 2, 3], 2.0, rtol=1e-10)
    np.testing.assert_allclose(f["correlation"][1, 2, 3], 1.0, rtol=1e-10)
    assert bool(f["significant"][1, 2, 3])
    assert np.all(np.abs(f["correlation"]) <= 1.0 + 1e-12)


def test_region_mean_metric_and_metric_validation():
    state = make_demo_state(nvars=2, nmems=15, seed=2)
    s = state.structure
    metric = region_mean_metric(
        s.var_names[0], time_index=1,
        lat_range=(s.lat.min(), s.lat.max()),
        lon_range=(s.lon.min(), s.lon.mean()),
    )
    j = metric_values(state, metric)
    assert j.shape == (15,)
    out = ensemble_sensitivity(state, metric)
    assert set(out) == set(s.var_names)
    assert "significant" not in out[s.var_names[0]]
    with pytest.raises(ValueError):
        metric_values(state, np.zeros(3))
    with pytest.raises(ValueError):
        region_mean_metric(s.var_names[0], lat_range=(99.0, 100.0))(state)


@pytest.mark.parametrize("unbiased", [True, False])
def test_single_ob_impact_matches_ensrf_exactly(unbiased):
    """For one unlocalized ob and a linear metric the predicted mean
    change matches the serial EnSRF update exactly (the gain identity),
    and with matched ddof (unbiased=True) the predicted variance change
    matches the square-root identity 2*beta*kdenom - beta^2*varye =
    kdenom exactly as well."""
    state = make_demo_state(ntimes=2, ny=6, nx=8, nmems=18, seed=3)
    obs = make_demo_obs(state, nobs=1, seed=4, radius=2000.0)
    metric = region_mean_metric(state.structure.var_names[0], time_index=1)
    jp_prior = metric_values(state, metric)

    df = observation_impact(state, obs, metric, unbiased=unbiased)
    cfg = FilterConfig(localization=None, dtype="float64",
                       unbiased_variance=unbiased)
    post, _ = EnSRF(state, list(obs), config=cfg, verbose=False).update()
    jp_post = metric_values(post, metric)

    dj_mean_actual = jp_post.mean() - jp_prior.mean()
    np.testing.assert_allclose(df["dJ_mean_pred"].iloc[0], dj_mean_actual,
                               rtol=1e-9, atol=1e-12)
    if unbiased:
        dvar_actual = np.var(jp_post, ddof=1) - np.var(jp_prior, ddof=1)
        np.testing.assert_allclose(df["dJ_var_pred"].iloc[0], dvar_actual,
                                   rtol=1e-9, atol=1e-14)
    # variance prediction is always a reduction
    assert df["dJ_var_pred"].iloc[0] <= 0.0


def test_impact_qc_and_targeting_ranking():
    """Out-of-time-domain obs get NaN predictions + qc_ok=False; among
    valid obs a smaller assigned error (same location) predicts at least
    as much variance reduction."""
    state = make_demo_state(nmems=16, seed=5)
    s = state.structure
    good = make_demo_obs(state, nobs=1, seed=6)[0]
    sharp = Observation(
        value=good.value, obtype=good.obtype, time=good.time,
        error=good.error / 16.0, lat=good.lat, lon=good.lon,
        assimilate_this=True, localize_radius=good.localize_radius,
    )
    bad = Observation(
        value=280.0, obtype=s.var_names[0],
        time=timeutil.to_datetime64(int(s.times_s[-1]) + 10 * 86400),
        error=1.0, lat=float(s.lat.mean()), lon=float(s.lon.mean()),
        assimilate_this=True, localize_radius=2000.0,
    )
    metric = region_mean_metric(s.var_names[0])
    df = observation_impact(state, [good, sharp, bad], metric)
    assert not df["qc_ok"].iloc[2]
    assert np.isnan(df["dJ_mean_pred"].iloc[2])
    assert df["qc_ok"].iloc[0] and df["qc_ok"].iloc[1]
    assert df["dJ_var_pred"].iloc[1] <= df["dJ_var_pred"].iloc[0] + 1e-15


@pytest.mark.parametrize("unbiased", [True, False])
def test_greedy_selection_exact_vs_serial_ensrf(unbiased):
    """Greedy sequential selection runs the exact serial square-root
    update in obs space, so for unlocalized obs + a linear metric the
    cumulative predicted dJ (and, with matched ddof, dVar(J)) equal what
    the EnSRF realizes when assimilating the picked set in pick order."""
    from efa_xray_tpu.postprocess.sensitivity import greedy_obs_selection

    state = make_demo_state(ntimes=2, ny=6, nx=8, nmems=20, seed=7)
    cands = make_demo_obs(state, nobs=12, seed=8)
    metric = region_mean_metric(state.structure.var_names[0], time_index=1)
    j0 = metric_values(state, metric)

    sel = greedy_obs_selection(state, cands, metric, nselect=4,
                               unbiased=unbiased)
    assert len(sel) == 4
    assert sel["candidate"].is_unique
    # steps are sorted by diminishing-returns ONLY in var terms per step
    assert (sel["dJ_var_step"] <= 1e-15).all()

    picked = [cands[i] for i in sel["candidate"]]
    cfg = FilterConfig(localization=None, dtype="float64",
                       unbiased_variance=unbiased)
    post, _ = EnSRF(state, picked, config=cfg, verbose=False).update()
    j1 = metric_values(post, metric)
    np.testing.assert_allclose(sel["dJ_mean_cum"].iloc[-1],
                               j1.mean() - j0.mean(), rtol=1e-9, atol=1e-12)
    if unbiased:
        np.testing.assert_allclose(
            sel["dJ_var_cum"].iloc[-1],
            np.var(j1, ddof=1) - np.var(j0, ddof=1), rtol=1e-9, atol=1e-14)


def test_greedy_discounts_harvested_information():
    """A duplicate of the top-scoring ob is NOT naively redundant (two
    independent measurements halve the effective R), but its RE-SCORED
    step-2 impact must shrink once the first copy is in — and greedy's
    realized pair must reduce var(J) at least as much as the naive
    top-2 pair (greedy's second pick maximizes the pair's reduction)."""
    from efa_xray_tpu.postprocess.sensitivity import greedy_obs_selection

    state = make_demo_state(ntimes=2, ny=6, nx=8, nmems=20, seed=9)
    cands = make_demo_obs(state, nobs=8, seed=10)
    metric = region_mean_metric(state.structure.var_names[0], time_index=1)
    j0 = metric_values(state, metric)

    imp = observation_impact(state, cands, metric)
    top = int(imp["dJ_var_pred"].idxmin())
    dup = Observation(
        value=cands[top].value, obtype=cands[top].obtype,
        time=cands[top].time, error=cands[top].error, lat=cands[top].lat,
        lon=cands[top].lon, assimilate_this=True, localize_radius=None,
    )
    cands2 = list(cands) + [dup]
    imp2 = observation_impact(state, cands2, metric)
    naive2 = list(imp2["dJ_var_pred"].nsmallest(2).index)
    assert set(naive2) == {top, len(cands)}  # naive re-counts the copy

    sel = greedy_obs_selection(state, cands2, metric, nselect=2)
    assert int(sel["candidate"].iloc[0]) == top
    second = int(sel["candidate"].iloc[1])
    # step-2 score of ANY pick is computed against the updated ensemble,
    # so it is smaller in magnitude than its naive (prior) score
    assert abs(sel["dJ_var_step"].iloc[1]) < abs(
        imp2["dJ_var_pred"].iloc[second]) - 1e-15

    def realized(pair):
        cfg = FilterConfig(localization=None, dtype="float64")
        post, _ = EnSRF(state, [cands2[i] for i in pair], config=cfg,
                        verbose=False).update()
        return np.var(metric_values(post, metric)) - np.var(j0)

    assert realized([int(i) for i in sel["candidate"]]) <= (
        realized(naive2) + 1e-12)
    with pytest.raises(ValueError):
        greedy_obs_selection(state, cands2, metric, nselect=0)
