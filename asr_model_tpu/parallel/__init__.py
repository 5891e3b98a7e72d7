from asr_model_tpu.parallel.mesh import make_mesh, MeshAxes
from asr_model_tpu.parallel.sharding import (param_shardings, batch_shardings,
                                             shard_params, make_sharded_train_step)
