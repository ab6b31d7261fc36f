from efa_xray_tpu.models import l96_2d  # noqa: F401
from efa_xray_tpu.models import lorenz96  # noqa: F401
from efa_xray_tpu.models import swe  # noqa: F401
