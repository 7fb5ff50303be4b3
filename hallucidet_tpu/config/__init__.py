"""hallucidet_tpu.config — flag-compatible configuration (SURVEY.md §2.2)."""

from hallucidet_tpu.config.config import Config  # noqa: F401
