from voice_tts_tpu.parallel.mesh import make_mesh, shard_params, param_sharding_rules
from voice_tts_tpu.parallel.training import make_train_step

__all__ = ["make_mesh", "shard_params", "param_sharding_rules", "make_train_step"]
