"""hallucidet_tpu.observability — wandb-surface logging + profiling hooks."""

from hallucidet_tpu.observability.wandb_logger import (  # noqa: F401
    WandbLogger,
    define_reference_metrics,
)
from hallucidet_tpu.observability.profiling import profile_trace, StepTimer  # noqa: F401
from hallucidet_tpu.observability.debug import setup_debug, checked  # noqa: F401
