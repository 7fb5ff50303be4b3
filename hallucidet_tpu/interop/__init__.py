"""hallucidet_tpu.interop — torch checkpoint conversion (SURVEY.md §5
checkpoint/resume: bit-compatible loading of published weights)."""

from hallucidet_tpu.interop.torch_loader import (  # noqa: F401
    convert_into_variables,
    load_detector_variables,
    load_encoder_decoder_variables,
    load_encoder_npz,
    load_torch_state_dict,
    merge_encoder_variables,
)
