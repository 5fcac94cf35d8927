from qcnn_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
)
from qcnn_tpu.parallel.sharding import (  # noqa: F401
    make_sharded_forward,
    param_shardings,
    shard_params,
)
from qcnn_tpu.parallel.pipeline import (  # noqa: F401
    STAGE_AXIS,
    make_pipeline_mesh,
    pipeline_vit_forward,
    place_pipeline_params,
    stack_vit_blocks,
)
