from efa_xray_tpu.postprocess.postprocess import obs_assimilation_statistics  # noqa: F401
