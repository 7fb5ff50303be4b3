"""CNN-based thermal infrared person detection by domain adaptation —
the reference's SPIE-paper baseline model (reference:
src/models/cnnBasedThermalInfraredDA.py:12-222): a stock detector fed by
classic IR preprocessing pipelines instead of a learned translation net.

The preprocessing ops live in translation/ir_preproc.py (pure jnp, fused into
the detector's XLA program); this wrapper provides the reference's model
surface: detector selection, predict(), and the `basic_preprocessing_*`
static methods.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from hallucidet_tpu.detection import Detector, Targets
from hallucidet_tpu.translation import ir_preproc


class CnnBasedThermalInfraredDA:
    def __init__(
        self,
        num_classes: int = 2,
        model_name: str = "fasterrcnn_resnet50_fpn",
        pretrained: bool = False,
        lr: float = 1e-5,
        preprocessing: str = "none",
        input_size: int = 300,
    ):
        self.detector = Detector(
            name=model_name, pretrained=pretrained,
            n_classes=num_classes, size=input_size,
        )
        self.lr = lr
        self.preprocessing = ir_preproc.PIPELINES[preprocessing]

    def init(self, rng: jax.Array):
        return self.detector.init(rng)

    def forward(self, variables, images: jnp.ndarray, targets: Targets,
                rng: Optional[jax.Array] = None):
        """preprocess -> frozen detector; (losses, detections)."""
        processed = self.preprocessing(images)
        return self.detector.calculate_loss(
            variables, processed, targets, train_det=False, rng=rng
        )

    def predict(self, variables, images: jnp.ndarray, targets: Targets,
                rng: Optional[jax.Array] = None):
        _, detections = self.forward(variables, images, targets, rng)
        return detections

    # ---- the reference's static preprocessing surface ----

    basic_preprocessing_invert = staticmethod(ir_preproc.invert)
    basic_preprocessing_blur = staticmethod(ir_preproc.gaussian_blur)
    basic_preprocessing_histogram_stretching_default = staticmethod(
        ir_preproc.histogram_stretching_default
    )
    basic_preprocessing_histogram_stretching = staticmethod(
        ir_preproc.histogram_stretching
    )
    basic_preprocessing_histogram_equalization = staticmethod(
        ir_preproc.histogram_equalization
    )
    basic_preprocessing_invert_stretching = staticmethod(
        ir_preproc.invert_stretching
    )
    basic_preprocessing_invert_stretching_blur = staticmethod(
        ir_preproc.invert_stretching_blur
    )
    basic_preprocessing_invert_equalization = staticmethod(
        ir_preproc.invert_equalization
    )
    basic_preprocessing_invert_equalization_blur = staticmethod(
        ir_preproc.invert_equalization_blur
    )
    paralel_combination = staticmethod(ir_preproc.parallel_combination)
