"""HalluciDet training module — the reference's EncoderDecoderLit as pure
jitted steps (reference: train_hallucidet.py:59-364).

The core algorithm (forward_step, train_hallucidet.py:161-240):
IR 1ch -> 3ch -> U-Net -> hallucinated RGB -> frozen detector loss on IR
targets + optional pixel/perceptual reconstruction; backward flows THROUGH the
detector into the hallucinated image (detector params stop-gradient'd — the
functional equivalent of requires_grad=False at :102-105); Adam over
encoder-decoder params only (:429-435); grad clip 0.5 (:498-499).

The whole IR -> U-Net -> resize -> detect -> loss graph compiles as ONE XLA
program. The reference computes RGB/IR-baseline detections every step; here
they run only in val/test (they never contribute gradients), one of the
deliberate TPU-side efficiency wins.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from hallucidet_tpu.detection import Detector, Targets
from hallucidet_tpu.losses import Reconstruction
from hallucidet_tpu.ops.image_ops import expand_one_channel_to_three
from hallucidet_tpu.train import optim as optim_lib
from hallucidet_tpu.translation import create_model


@dataclasses.dataclass
class HalluciDetTrainConfig:
    detector: str = "fasterrcnn"
    decoder_backbone: str = "resnet34"
    segmentation_head: str = "sigmoid"
    arch: str = "unet"
    n_classes: int = 2
    input_size: int = 300
    output_channels: int = 3
    lr: float = 1e-4
    optimizer: str = "adam"
    gradient_clip_val: float = 0.5
    train_det: bool = False  # optionally unfreeze the detector (Config.Detector.train_det)
    pixel: Optional[str] = None
    perceptual: Optional[str] = None
    loss_weights: Optional[Dict[str, float]] = None
    # 16 -> the translation net computes in bf16 (params kept f32, cast per
    # step; hallucinated output recast to f32 before the detector). The
    # reference's Lightning AMP flag equivalent (--precision).
    precision: int = 32
    # per-block activation remat: needed to fit megapixel training batches
    remat: bool = True
    # hand the U-Net's s2d decoder tail to the detector resize in phase form
    # (exact; ops/fused_upsample.py) — the full-resolution hallucinated image
    # never materializes in HBM. Auto-disabled whenever a reconstruction loss
    # needs the full-res image or the model/head can't produce phase output.
    phase_handoff: bool = True


def auto_remat(
    precision: int, batch: int, hw: Tuple[int, int] = (1024, 1280),
    hbm_budget_gb: float = 13.5,
) -> bool:
    """Whether per-block remat is needed for a training geometry.

    The measured no-remat footprint of the reference recipe (batch 8, f32,
    LLVIP-native 1024x1280) is 26.4 GB; activations dominate and scale
    linearly in batch, pixels, and dtype width. bf16 batch-8 fits v5e's
    15.75 GB HBM and trains ~15% faster without the recompute (PERF.md:
    184.0 vs 216.9 ms/step), so remat engages only when the scaled
    estimate crosses the budget."""
    bytes_px = 2 if precision == 16 else 4
    est_gb = (
        26.4 * (bytes_px / 4) * (batch / 8)
        * (hw[0] * hw[1]) / (1024 * 1280)
    )
    return est_gb > hbm_budget_gb


DEFAULT_WEIGHTS = {
    "pixel_rgb": 0.0, "pixel_ir": 0.0, "perceptual_rgb": 0.0,
    "perceptual_ir": 0.0, "det_regression": 0.1, "det_classification": 0.1,
    "det_objectness": 0.1, "det_rpn_box_reg": 0.1, "det_bbox_ctrness": 0.1,
    "det_masked": 0.0,
}


class HalluciDetModule:
    """encoder_decoder (trainable) + detector (frozen); jitted forward_step."""

    def __init__(
        self,
        cfg: HalluciDetTrainConfig,
        rng: jax.Array,
        detector_variables=None,
        sample_hw: Tuple[int, int] = (128, 160),
    ):
        self.cfg = cfg
        self.weights = dict(DEFAULT_WEIGHTS)
        if cfg.loss_weights:
            self.weights.update(cfg.loss_weights)

        kw = {"remat": cfg.remat} if cfg.arch in ("unet", "unetmodified") else {}
        self.encoder_decoder = create_model(
            arch=cfg.arch, encoder_name=cfg.decoder_backbone,
            classes=cfg.output_channels, head=cfg.segmentation_head, **kw,
        )
        k1, k2 = jax.random.split(rng)
        dummy = jnp.zeros((1, sample_hw[0], sample_hw[1], 3), jnp.float32)
        self.ed_variables = self.encoder_decoder.init(k1, dummy, False)

        self.detector = Detector(
            name=cfg.detector, n_classes=cfg.n_classes, size=cfg.input_size
        )
        self.det_variables = detector_variables or self.detector.init(k2)

        self.loss_pixel = Reconstruction.select_loss_pixel(cfg.pixel)
        self.loss_perceptual = Reconstruction.select_loss_perceptual(cfg.perceptual)

        # Phase handoff is valid when (a) the model computes its tail in s2d
        # phase form with an elementwise head (phase output == D2S'd output
        # exactly), and (b) nothing downstream needs the full-res image —
        # i.e. no active reconstruction loss (the default recipe: det-loss
        # only, train_hallucidet.py weights pixel/perceptual = 0).
        w = self.weights
        recon_active = (
            self.loss_pixel is not None
            and (w["pixel_rgb"] != 0.0 or w["pixel_ir"] != 0.0)
        ) or (
            self.loss_perceptual is not None
            and (w["perceptual_rgb"] != 0.0 or w["perceptual_ir"] != 0.0)
        )
        model = self.encoder_decoder
        phase_capable = (
            bool(getattr(model, "s2d_tail", False))
            and getattr(model, "decoder_attention_type", None) is None
            and getattr(model, "head", None) in ("sigmoid", "identity", "tanh")
        )
        self.use_phase_handoff = (
            cfg.phase_handoff and phase_capable and not recon_active
        )
        # (fh, fw) of the model's phase output — threaded to the detector so
        # its transform consumes the right form (ops/fused_upsample.py)
        self.phase_factors = tuple(getattr(model, "s2d_factors", (2, 2)))
        # On the handoff path the U-Net consumes the RAW 1-channel IR frame:
        # the ResNet stem folds its 3-channel kernel over the replicated
        # channels (exact — nn/resnet.py gray_fold), skipping the megapixel
        # 1->3 expand entirely.
        from hallucidet_tpu.nn.resnet import RESNET_SPECS

        self.use_gray_fold = (
            self.use_phase_handoff and cfg.decoder_backbone in RESNET_SPECS
        )

        self.tx = optim_lib.build_optimizer(
            cfg.optimizer, cfg.lr, gradient_clip_val=cfg.gradient_clip_val
        )
        # train_det=True (the reference's Config.Detector.train_det unfreeze,
        # train_hallucidet.py:433) puts the detector params in the optimizer
        # too; the train-step state then carries {"ed": ..., "det": ...}.
        if cfg.train_det:
            self.opt_state = self.tx.init(
                {"ed": self.ed_variables["params"],
                 "det": self.det_variables["params"]}
            )
        else:
            self.opt_state = self.tx.init(self.ed_variables["params"])

    # ---- the core algorithm ----

    def forward_step(
        self,
        ed_params,
        ed_batch_stats,
        det_params,
        imgs_rgb: jnp.ndarray,
        targets_rgb: Targets,
        imgs_ir: jnp.ndarray,
        targets_ir: Targets,
        rng: jax.Array,
        train: bool,
        with_baseline_detections: bool,
        want_hallucinated: bool = True,
    ):
        w = self.weights
        gray = self.use_gray_fold
        ir3 = None if gray else expand_one_channel_to_three(imgs_ir)

        half = self.cfg.precision == 16
        compute_dtype = jnp.bfloat16 if half else jnp.float32
        ed_vars = {"params": ed_params, "batch_stats": ed_batch_stats}
        if half:
            ed_vars = jax.tree_util.tree_map(
                lambda t: t.astype(jnp.bfloat16), ed_vars
            )
        unet_in = (imgs_ir if gray else ir3).astype(compute_dtype)
        # the benched product path: the s2d decoder tail hands its phase-form
        # output straight to the detector transform's resize — the full-res
        # hallucinated image never materializes (exact; tests/test_s2d_tail.py
        # and tests/test_phase_handoff.py)
        phase = self.use_phase_handoff
        apply_kw = {"output_phase_form": True} if phase else {}
        if train:
            hallucinated, upd = self.encoder_decoder.apply(
                ed_vars, unet_in, True, mutable=["batch_stats"], **apply_kw
            )
            new_bs = upd["batch_stats"]
            if half:  # keep the persistent stats in f32
                new_bs = jax.tree_util.tree_map(
                    lambda t: t.astype(jnp.float32), new_bs
                )
        else:
            hallucinated = self.encoder_decoder.apply(
                ed_vars, unet_in, False, **apply_kw
            )
            new_bs = ed_batch_stats
        if not phase:
            hallucinated = hallucinated.astype(jnp.float32)
        # on the phase path the tensor stays in the U-Net compute dtype: the
        # detector transform's resize einsum upcasts per-element inside the
        # contraction (exact — bf16->f32 conversion is lossless and the
        # accumulation is f32 either way), skipping a full megapixel
        # convert pass (ops/image_ops.resize_bilinear_from_phase)

        loss_pixel_rgb = loss_pixel_ir = 0.0
        loss_perc_rgb = loss_perc_ir = 0.0
        if not phase:
            if self.loss_pixel is not None:
                loss_pixel_rgb = self.loss_pixel(imgs_rgb, hallucinated) * w["pixel_rgb"]
                loss_pixel_ir = self.loss_pixel(ir3, hallucinated) * w["pixel_ir"]
            if self.loss_perceptual is not None:
                loss_perc_rgb = (
                    self.loss_perceptual(imgs_rgb, hallucinated) * w["perceptual_rgb"]
                )
                loss_perc_ir = self.loss_perceptual(ir3, hallucinated) * w["perceptual_ir"]

        # frozen detector (default): gradients flow through activations, not
        # params. With cfg.train_det the detector params stay differentiable
        # and the loss forward runs in train mode during training
        # (reference: train_hallucidet.py:102-105, :179-180).
        unfreeze = self.cfg.train_det
        det_frozen = det_params if unfreeze else jax.lax.stop_gradient(det_params)
        losses_det, det_hall = self.detector.calculate_loss(
            {"params": det_frozen}, hallucinated, targets_ir,
            train_det=unfreeze and train, rng=rng,
            phase_form=self.phase_factors if phase else False,
            half=half,
        )

        name = self.detector.name
        out = dict(losses_det)
        if name == "fasterrcnn":
            out["classification"] = losses_det["loss_classifier"]
            out["bbox_regression"] = losses_det["loss_box_reg"]
        out["bbox_regression"] = out["bbox_regression"] * w["det_regression"]
        out["classification"] = out["classification"] * w["det_classification"]
        out["loss_objectness"] = (
            losses_det["loss_objectness"] * w["det_objectness"]
            if name == "fasterrcnn" else 0.0
        )
        out["loss_rpn_box_reg"] = (
            losses_det["loss_rpn_box_reg"] * w["det_rpn_box_reg"]
            if name == "fasterrcnn" else 0.0
        )
        out["bbox_ctrness"] = (
            losses_det["bbox_ctrness"] * w["det_bbox_ctrness"]
            if name == "fcos" else 0.0
        )
        loss_det_total = (
            out["bbox_regression"] + out["classification"]
            + out["loss_objectness"] + out["loss_rpn_box_reg"]
            + out["bbox_ctrness"]
        )
        total = (
            loss_det_total + loss_pixel_rgb + loss_perc_rgb
            + loss_pixel_ir + loss_perc_ir
        )

        det_rgb = det_ir = None
        if with_baseline_detections:
            if ir3 is None:
                ir3 = expand_one_channel_to_three(imgs_ir)
            _, det_rgb = self.detector.calculate_loss(
                {"params": det_frozen}, imgs_rgb, targets_rgb,
                train_det=False, rng=rng, half=half,
            )
            _, det_ir = self.detector.calculate_loss(
                {"params": det_frozen}, ir3, targets_ir,
                train_det=False, rng=rng, half=half,
            )

        logs = {
            "total": total,
            "pixel_rgb": loss_pixel_rgb,
            "perceptual_rgb": loss_perc_rgb,
            "pixel_ir": loss_pixel_ir,
            "perceptual_ir": loss_perc_ir,
            "det_regression": out["bbox_regression"],
            "det_classification": out["classification"],
            "det_objectness": out["loss_objectness"],
            "det_rpn_box_reg": out["loss_rpn_box_reg"],
            "det_bbox_ctrness": out["bbox_ctrness"],
            "det_total": loss_det_total,
        }
        if not want_hallucinated:
            hall_out = None
        elif phase:
            # interleave the phase tensor back to the full-res image only
            # when a consumer (plotting, recon tests) asks for it
            from hallucidet_tpu.ops.fused_upsample import depth_to_space

            hall_out = depth_to_space(
                hallucinated.astype(jnp.float32), *self.phase_factors
            )
        else:
            hall_out = hallucinated
        return total, new_bs, logs, (det_hall, det_rgb, det_ir), hall_out

    # ---- steps ----

    def make_train_step(self) -> Callable:
        tx = self.tx

        if self.cfg.train_det:
            # unfrozen detector: state[0] = {"ed": ..., "det": ...} and both
            # trees receive optimizer updates (reference:
            # train_hallucidet.py:429-435 optimizes enc-dec + detector).
            def step(state, batch, rng):
                params, ed_bs, opt_state = state
                imgs_rgb, t_rgb, imgs_ir, t_ir = batch

                def loss_fn(p):
                    total, new_bs, logs, _, _ = self.forward_step(
                        p["ed"], ed_bs, p["det"],
                        imgs_rgb, t_rgb, imgs_ir, t_ir, rng,
                        train=True, with_baseline_detections=False,
                        want_hallucinated=False,
                    )
                    return total, (new_bs, logs)

                (total, (new_bs, logs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, new_bs, opt_state), logs

            return step

        def step(state, batch, rng):
            ed_params, ed_bs, opt_state = state
            imgs_rgb, t_rgb, imgs_ir, t_ir = batch

            def loss_fn(p):
                total, new_bs, logs, _, _ = self.forward_step(
                    p, ed_bs, self.det_variables["params"],
                    imgs_rgb, t_rgb, imgs_ir, t_ir, rng,
                    train=True, with_baseline_detections=False,
                    want_hallucinated=False,
                )
                return total, (new_bs, logs)

            (total, (new_bs, logs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(ed_params)
            updates, opt_state = tx.update(grads, opt_state, ed_params)
            ed_params = optax.apply_updates(ed_params, updates)
            return (ed_params, new_bs, opt_state), logs

        return step

    def precast_eval_state(self, state):
        """Pre-cast the encoder-decoder tree to bf16 once per eval loop
        (precision 16): forward_step's per-step astype then becomes an XLA
        no-op, saving the cast traffic on every step. The detector tree
        (train_det state) stays f32 — detector box math never runs bf16
        (PERF.md policy). Exact: cast(cast(x)) == cast(x)."""
        if self.cfg.precision != 16:
            return state
        cast = lambda tree: jax.tree_util.tree_map(
            lambda t: t.astype(jnp.bfloat16), tree
        )
        p0 = state[0]
        p0 = {**p0, "ed": cast(p0["ed"])} if self.cfg.train_det else cast(p0)
        return (p0, cast(state[1]), *state[2:])

    def make_eval_step(
        self, with_baselines: bool = True, with_hallucinated: bool = False
    ) -> Callable:
        # With cfg.train_det, state[0] is the combined {"ed","det"} tree the
        # train step produces — eval must see the UPDATED detector params,
        # not the frozen self.det_variables (advisor r2, trainer.py:118).
        def step(state, batch, rng):
            if self.cfg.train_det:
                ed_params = state[0]["ed"]
                det_params = state[0]["det"]
            else:
                ed_params = state[0]
                det_params = self.det_variables["params"]
            ed_bs = state[1]
            imgs_rgb, t_rgb, imgs_ir, t_ir = batch
            total, _, logs, dets, hall = self.forward_step(
                ed_params, ed_bs, det_params,
                imgs_rgb, t_rgb, imgs_ir, t_ir, rng,
                train=False, with_baseline_detections=with_baselines,
                want_hallucinated=with_hallucinated,
            )
            return total, logs, dets, hall

        return step
