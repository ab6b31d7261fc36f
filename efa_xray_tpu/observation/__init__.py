from efa_xray_tpu.observation.observation import Observation, ObservationBatch  # noqa: F401
from efa_xray_tpu.observation.bias import BiasCorrection  # noqa: F401
from efa_xray_tpu.observation.localization import (  # noqa: F401
    gaspari_cohn,
    haversine,
    distance_to_point,
    pairwise_distance,
)
