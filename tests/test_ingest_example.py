"""The real-data file-ingest walkthrough (examples/real_data_ingest.py)
must run end to end in this image: netCDF on disk -> EnsembleState -> CLI
assimilate -> posterior + stats, with metadata preserved (offline analog
of the reference demo's THREDDS fetch, ``efa_demo.ipynb`` cell 6)."""

import os
import sys

import numpy as np


def test_real_data_ingest_walkthrough(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from examples import real_data_ingest as m

    rc = m.main(["--workdir", str(tmp_path)])
    assert rc == 0
    # artifacts exist and the posterior kept its metadata
    from efa_xray_tpu.state.ensemble import EnsembleState

    post = EnsembleState.from_netcdf(str(tmp_path / "posterior.nc"))
    assert post.var_attrs["T2M"]["units"] == "K"
    assert "fhour" in post.extra_coords
    prior = EnsembleState.from_netcdf(str(tmp_path / "gefs_like_prior.nc"))
    # analysis actually moved the state
    assert not np.allclose(np.asarray(post.data), np.asarray(prior.data))
