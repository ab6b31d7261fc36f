from efa_xray_tpu.parallel.mesh import make_mesh, shard_state_array, pad_to_multiple  # noqa: F401
from efa_xray_tpu.parallel.sharded import ensrf_update_sharded  # noqa: F401
