from efa_xray_tpu.models import lorenz96  # noqa: F401
