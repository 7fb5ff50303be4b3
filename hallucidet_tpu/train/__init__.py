"""hallucidet_tpu.train — optimizers, schedulers, DP mesh, checkpointing, and
the training orchestration layer (SURVEY.md §2.1, §2.8)."""

from hallucidet_tpu.train.optim import (  # noqa: F401
    EarlyStopping,
    PlateauScheduler,
    build_optimizer,
    detector_head_only_mask,
    pretrained_backbone_mask,
    warmup_lr_schedule,
)
from hallucidet_tpu.train.parallel import (  # noqa: F401
    data_sharding,
    dp_jit,
    make_mesh,
    reduce_dict,
    replicate,
    shard_batch,
)
from hallucidet_tpu.train.checkpoint import (  # noqa: F401
    CheckpointManager,
    load_pytree,
    save_pytree,
)
from hallucidet_tpu.train.detector_module import (  # noqa: F401
    DetectorModule,
    DetectorTrainConfig,
)
from hallucidet_tpu.train.hallucidet_module import (  # noqa: F401
    HalluciDetModule,
    HalluciDetTrainConfig,
    auto_remat,
)
from hallucidet_tpu.train.trainer import Trainer  # noqa: F401
