"""Observation batch I/O: HDF5(netCDF4-convention) round-trip + DataFrame
interop.  The reference has no observation persistence at all (obs live as
in-memory Observation objects, efa_xray/observation/observation.py:17-36)."""

import numpy as np
import pytest

from conftest import make_demo_obs, make_demo_state
from efa_xray_tpu.observation.observation import ObservationBatch
from efa_xray_tpu.utils import ncio


@pytest.fixture
def batch():
    state = make_demo_state(nmems=10, seed=1)
    b = ObservationBatch.coerce(make_demo_obs(state, nobs=13, seed=2,
                                              radius=900.0))
    # exercise optional fields
    b.localize_radius[3] = np.inf
    b.assimilate_flags[4] = False
    b.verts[5] = 850.0
    b.vert_radius[5] = 200.0
    b.descriptions[6] = "buoy 46042"
    return b


def test_obs_roundtrip_plain(tmp_path, batch):
    path = str(tmp_path / "obs.nc")
    ncio.write_obs(path, batch)
    back = ncio.read_obs(path)
    assert back.nobs == batch.nobs
    for f in ("values", "errors", "lats", "lons", "localize_radius",
              "verts", "vert_radius"):
        np.testing.assert_array_equal(getattr(back, f), getattr(batch, f))
    np.testing.assert_array_equal(back.times_s, batch.times_s)
    assert back.obtypes == list(batch.obtypes)
    assert back.descriptions == list(batch.descriptions)
    np.testing.assert_array_equal(back.assimilate_flags,
                                  batch.assimilate_flags)
    assert back.prior_mean is None
    # coerce() pre-fills assimilated=False; the flag round-trips verbatim
    np.testing.assert_array_equal(
        np.asarray(back.assimilated, bool) if back.assimilated is not None
        else np.zeros(batch.nobs, bool),
        np.zeros(batch.nobs, bool),
    )


def test_obs_roundtrip_with_results(tmp_path, batch):
    from efa_xray_tpu.assimilation.ensrf import EnSRF

    state = make_demo_state(nmems=10, seed=1)
    post, b = EnSRF(state, batch, verbose=False, loc="GC").update()
    path = str(tmp_path / "obs_post.nc")
    ncio.write_obs(path, b)
    back = ncio.read_obs(path)
    np.testing.assert_allclose(back.prior_mean, b.prior_mean)
    np.testing.assert_allclose(back.post_var, b.post_var)
    np.testing.assert_array_equal(back.assimilated, b.assimilated)


def test_dataframe_roundtrip(batch):
    df = batch.to_dataframe()
    back = ObservationBatch.from_dataframe(df)
    np.testing.assert_array_equal(back.values, batch.values)
    np.testing.assert_array_equal(back.lats, batch.lats)
    np.testing.assert_array_equal(back.times_s, batch.times_s)
    np.testing.assert_array_equal(back.localize_radius,
                                  batch.localize_radius)
    np.testing.assert_array_equal(back.vert_radius, batch.vert_radius)
    assert back.obtypes == list(batch.obtypes)
    assert back.descriptions == list(batch.descriptions)


def test_dataframe_minimal_columns():
    import pandas as pd

    df = pd.DataFrame(
        {
            "value": [280.0, 281.5],
            "error": [1.0, 2.0],
            "lat": [45.0, 46.0],
            "lon": [235.0, 236.0],
            "time": np.array(["2026-08-01T00", "2026-08-01T06"],
                             dtype="datetime64[s]"),
            "obtype": ["T2m", "T2m"],
        }
    )
    b = ObservationBatch.from_dataframe(df)
    assert b.nobs == 2
    assert np.isinf(b.localize_radius).all()
    assert b.assimilate_flags.all()
    assert np.isnan(b.verts).all()
    assert b.descriptions == [None, None]
