from efa_xray_tpu.postprocess.postprocess import obs_assimilation_statistics  # noqa: F401
from efa_xray_tpu.postprocess.verification import (  # noqa: F401
    crps,
    desroziers_diagnostics,
    field_verification,
    innovation_consistency,
    rank_histogram,
)
from efa_xray_tpu.postprocess.sensitivity import (  # noqa: F401
    ensemble_sensitivity,
    greedy_obs_selection,
    observation_impact,
    region_mean_metric,
)
