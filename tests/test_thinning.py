"""Observation preprocessing (superobbing + distance thinning)."""

import numpy as np
import pytest

from efa_xray_tpu.observation.observation import ObservationBatch
from efa_xray_tpu.observation.thinning import superob, thin_by_distance
from efa_xray_tpu.utils import timeutil


def _batch(lats, lons, values=None, errors=None, obtypes=None,
           assim=None, custom=None):
    n = len(lats)
    t0 = timeutil.to_epoch_seconds(np.repeat(np.datetime64("2026-08-01"), n))
    return ObservationBatch(
        values=np.asarray(values if values is not None else np.full(n, 280.0),
                          float),
        errors=np.asarray(errors if errors is not None else np.ones(n), float),
        lats=np.asarray(lats, float),
        lons=np.asarray(lons, float),
        times_s=t0,
        obtypes=list(obtypes) if obtypes is not None else ["T2m"] * n,
        localize_radius=np.full(n, 2000.0),
        assimilate_flags=np.asarray(assim if assim is not None
                                    else np.ones(n, bool)),
        verts=np.full(n, np.nan),
        descriptions=[None] * n,
        custom_operator=None if custom is None else np.asarray(custom, bool),
    )


def test_superob_merges_colocated_duplicates():
    # four obs in one 1-degree cell, one far away
    b = _batch([40.1, 40.2, 40.3, 40.4, 55.0],
               [250.1, 250.2, 250.3, 250.4, 300.0],
               values=[280.0, 281.0, 282.0, 283.0, 270.0])
    out = superob(b, cell_deg=1.0)
    assert len(out) == 2
    # equal errors -> plain mean; combined variance = R/n
    i = int(np.argmin(np.abs(out.lats - 40.25)))
    assert out.values[i] == pytest.approx(281.5)
    assert out.errors[i] == pytest.approx(0.25)
    assert out.descriptions[i] == "superob(n=4)"
    j = 1 - i
    assert out.values[j] == pytest.approx(270.0)
    assert out.errors[j] == pytest.approx(1.0)


def test_superob_is_precision_weighted():
    b = _batch([40.0, 40.0], [250.0, 250.0], values=[280.0, 284.0],
               errors=[1.0, 3.0])
    out = superob(b, cell_deg=2.0)
    assert len(out) == 1
    w = np.array([1.0, 1.0 / 3.0])
    assert out.values[0] == pytest.approx((280 * w[0] + 284 * w[1]) / w.sum())
    assert out.errors[0] == pytest.approx(1.0 / w.sum())


def test_superob_separates_obtypes_and_passthrough():
    b = _batch([40.0, 40.0, 40.0, 40.0], [250.0] * 4,
               obtypes=["T2m", "PS", "T2m", "T2m"],
               assim=[True, True, False, True],
               custom=[False, False, False, True])
    out = superob(b, cell_deg=5.0)
    # T2m cell merges only the one plain assimilable T2m ob... plus PS cell,
    # plus the QC'd-off and custom-H passthroughs.
    assert len(out) == 4
    assert sorted(out.obtypes) == ["PS", "T2m", "T2m", "T2m"]
    assert np.asarray(out.custom_operator).sum() == 1
    assert (~np.asarray(out.assimilate_flags)).sum() == 1


def test_superob_longitude_wraparound():
    b = _batch([0.0, 0.0], [359.9, 0.1])
    out = superob(b, cell_deg=360.0)  # one global cell
    assert len(out) == 1
    # circular mean lands on the dateline-adjacent 0 meridian, not 180
    assert min(out.lons[0], 360 - out.lons[0]) < 1.0


def test_thin_by_distance_enforces_separation_and_prefers_accurate():
    # a tight cluster (within ~30 km) + one distant ob
    b = _batch([40.0, 40.1, 40.2, 50.0], [250.0, 250.0, 250.0, 280.0],
               errors=[2.0, 0.5, 1.0, 1.0])
    out = thin_by_distance(b, min_km=100.0)
    assert len(out) == 2
    kept = set(zip(out.lats, out.errors))
    assert (40.1, 0.5) in kept  # the cluster's most accurate member
    assert (50.0, 1.0) in kept
    # pairwise separation respected
    from efa_xray_tpu.observation.localization import gaspari_cohn_np  # noqa: F401
    from efa_xray_tpu.observation import localization as loc
    import jax.numpy as jnp

    d = np.array(loc.pairwise_distance(out.lats, out.lons,
                                       out.lats, out.lons))
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 100.0


def test_thin_keeps_passthrough_obs():
    b = _batch([40.0, 40.01, 40.02], [250.0, 250.0, 250.0],
               errors=[1.0, 2.0, 3.0],
               assim=[True, False, True])
    out = thin_by_distance(b, min_km=50.0)
    # best cluster member + the QC'd-off passthrough survive
    assert len(out) == 2
    assert (~np.asarray(out.assimilate_flags)).sum() == 1


def test_thinned_batch_assimilates():
    """The preprocessed batch must flow through a filter unchanged."""
    from conftest import make_demo_state
    from efa_xray_tpu.assimilation.ensrf import EnSRF
    from efa_xray_tpu.config import FilterConfig

    state = make_demo_state(ny=6, nx=8, nmems=12)
    s = state.structure
    rng = np.random.default_rng(5)
    n = 40
    b = _batch(rng.uniform(s.lat.min() + 0.5, s.lat.max() - 0.5, n),
               rng.uniform(s.lon.min() + 0.5, s.lon.max() - 0.5, n),
               values=rng.normal(280, 2, n))
    b.times_s = timeutil.to_epoch_seconds(
        np.repeat(timeutil.to_datetime64(int(s.times_s[0])), n))
    small = superob(thin_by_distance(b, min_km=30.0), cell_deg=1.0)
    assert 0 < len(small) <= n
    post, out = EnSRF(state, small,
                      config=FilterConfig(localization="GC",
                                          dtype="float64")).update()
    assert out.assimilated.all()
    assert np.nanmean(out.post_var) < np.nanmean(out.prior_var)


def test_thin_is_pole_safe():
    """Near the pole, longitude cells collapse — a lat/lon hash would miss
    neighbors across many lon cells.  Two obs 0.2 deg from the pole at
    opposite longitudes are ~44 km apart and must not both survive a
    100 km thinning."""
    b = _batch([89.8, 89.8, 45.0], [0.0, 180.0, 90.0],
               errors=[0.5, 1.0, 1.0])
    out = thin_by_distance(b, min_km=100.0)
    assert len(out) == 2
    assert 0.5 in list(out.errors)  # the better polar ob survived
    # brute-force check of the invariant on a random polar cloud
    rng = np.random.default_rng(9)
    n = 200
    bb = _batch(rng.uniform(85.0, 90.0, n), rng.uniform(0, 360, n),
                errors=rng.uniform(0.5, 2.0, n))
    out = thin_by_distance(bb, min_km=80.0)
    from efa_xray_tpu.observation import localization as loc

    d = np.array(loc.pairwise_distance(out.lats, out.lons,
                                       out.lats, out.lons))
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 80.0 - 1e-6
