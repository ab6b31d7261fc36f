from efa_xray_tpu.state.structure import StateStructure  # noqa: F401
from efa_xray_tpu.state.ensemble import EnsembleState  # noqa: F401
