from efa_xray_tpu.assimilation.assimilation import Assimilation, update  # noqa: F401
from efa_xray_tpu.assimilation.enkf import EnKF  # noqa: F401
from efa_xray_tpu.assimilation.ensrf import EnSRF  # noqa: F401
from efa_xray_tpu.assimilation.letkf import LETKF  # noqa: F401
from efa_xray_tpu.assimilation.adaptive_inflation import AdaptiveInflation  # noqa: F401
