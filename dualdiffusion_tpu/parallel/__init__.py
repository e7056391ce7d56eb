from .mesh import (make_mesh, batch_sharding, replicated_sharding,
                   shard_batch, param_sharding_rule, shard_train_state,
                   replicate_state, MeshConfig)
from .sharded_ops import sharded_tiled_encode, sharded_tiled_decode
from .unet_pipeline import (build_stage_plan, unet_pipeline_apply,
                            pipelined_denoise)
from .distributed import (maybe_initialize_distributed, is_main_process,
                          process_count)
