"""hallucidet_tpu.losses — reconstruction loss glue (SURVEY.md §2.7)."""

from hallucidet_tpu.losses.losses import Reconstruction, msssim_loss  # noqa: F401
