from efa_xray_tpu.utils import timeutil  # noqa: F401
