"""hallucidet_tpu.utils — shared helper surface (SURVEY.md §2.7)."""

from hallucidet_tpu.utils.utils import Utils  # noqa: F401
