"""Global config: nested namespaces + CLI parser, drop-in flag compatible.

Rebuild of the reference Config (reference: src/config/config.py:6-357) — the
same namespace attributes, flag names, and defaults, so existing launch
commands work unchanged. Optimizer/scheduler factories return optax
transforms instead of torch optimizers.

Note: `set_loss_weights` keeps the reference's merge quirk — a flag explicitly
set to its default value is ignored (reference: config.py:321-357).
"""

from __future__ import annotations

import argparse
import os
from typing import Optional

import optax


class Config:
    class Environment:
        N_CORE = "8"
        N_THREADS = 8
        N_DEVICES = 1  # data-parallel device count (reference N_GPUS=1)
        DEBUG = False

    class Optimizer:
        name = "adam"
        scheduler_step_size = 10
        scheduler_gamma = 0.1
        scheduler_on = True
        gradient_clip_val = 0.5

    class Dataset:
        train_valid_split = 0.8
        dataset = "llvip"
        train_path = "../datasets/LLVIP/"
        valid_path = None
        test_path = "../datasets/LLVIP/"
        ext = ".jpg"
        n_classes = 2
        max_boxes = 64  # static GT capacity (padded-box design)

    class Losses:
        hparams_losses_weights = {
            "pixel_rgb": 0.0,
            "pixel_ir": 0.0,
            "perceptual_rgb": 0.0,
            "perceptual_ir": 0.0,
            "det_regression": 0.1,
            "det_classification": 0.1,
            "det_objectness": 0.1,
            "det_rpn_box_reg": 0.1,
            "det_bbox_ctrness": 0.1,
            "det_masked": 0.0,
        }
        pixel = None
        perceptual = None
        label_smoothing = 0.0

    class EncoderDecoder:
        in_channels_encoder = 3
        out_channels_decoder = 3
        decoder_head = "sigmoid"
        load_encoder_decoder = False
        encoder_decoder_load_path = (
            "lightning_logs/wacv2024/"
            "detector_fasterrcnn_hallucidet_det01reg01_llvip_200ep_changehead_seed123/"
            "llvip_ir_fasterrcnn/best.ckpt"
        )

    class Detector:
        train_det = False
        name = "fasterrcnn"
        pretrained = True
        input_size = 300  # 640 for flir
        batch_norm_eps = 0.001
        batch_norm_momentum = 0.03
        eval_path = None
        modality = None
        score_threshold = 0.5

    # ---- CLI ----

    @staticmethod
    def argument_parser(argv=None):
        parser = argparse.ArgumentParser(description="HalluciDet")
        parser.add_argument("--dataset", type=str, default=None, help="llvip/flir")
        parser.add_argument("--train", type=str, default=None, help="Train Dataset Path")
        parser.add_argument("--valid", type=str, default=None, help="Valid Dataset Path")
        parser.add_argument("--test", type=str, default=None, help="Test Dataset Path")
        parser.add_argument(
            "--n-classes", "--n_classes", "--num-classes", "--nclasses",
            type=int, default=2, help="Number of classes (default: 2)",
        )
        parser.add_argument(
            "--detector", type=str, default="fasterrcnn",
            help="fasterrcnn / fcos / retinanet",
        )
        parser.add_argument("--pretrained", action="store_true")
        parser.add_argument("--fine-tuning", action="store_true")
        parser.add_argument("--fine-tuning-lp", action="store_true")
        parser.add_argument("--modality", type=str, default="rgb", help="rgb or ir")
        parser.add_argument("--threshold", type=float, default=0.5)
        parser.add_argument("--epochs", type=int, default=10)
        parser.add_argument("--lr", type=float, default=None)
        parser.add_argument("--seed", type=int, default=123)
        parser.add_argument("--wandb-project", type=str, default="hallucidet")
        parser.add_argument("--wandb-name", type=str, default="detector")
        parser.add_argument("--batch", type=int, default=16)
        parser.add_argument("--num-workers", type=int, default=4)
        parser.add_argument("--ext", "--input-ext", type=str, default=None)
        parser.add_argument("--output-model", type=str, default="example.ckpt")
        parser.add_argument("--detector-path", type=str, default=None)
        parser.add_argument("--device", type=str, default=None, help="tpu or cpu")
        parser.add_argument(
            "--n-devices", type=int, default=None,
            help="data-parallel device count (Config.Environment.N_DEVICES; "
            "the reference's N_GPUS). >1 runs every step DP over a mesh.",
        )
        parser.add_argument(
            "--fuse-data", type=str, default="none",
            help="none, addition, attention, cross",
        )
        parser.add_argument(
            "--decoder-backbone", type=str, default="resnet34",
            help="resnet18, resnet34, resnet50",
        )
        parser.add_argument("--precision", type=int, default=32, help="16 or 32")
        parser.add_argument(
            "--optimizer", type=str, default="adamw", help="adamw, adam, sgd, lion"
        )
        parser.add_argument("--path", type=str, default=None)
        parser.add_argument("--segmentation-head", type=str, default="sigmoid")
        parser.add_argument("--pixel", type=str, default=None, help="mse / l1")
        parser.add_argument("--weight-pixel-rgb", type=float, default=0.0)
        parser.add_argument("--weight-pixel-ir", type=float, default=0.0)
        parser.add_argument(
            "--perceptual", type=str, default=None,
            help="psnr / ssim / msssim / lpips_alexnet / lpips_vgg / lpips_squeeze",
        )
        parser.add_argument("--weight-perceptual-rgb", type=float, default=0.0)
        parser.add_argument("--weight-perceptual-ir", type=float, default=0.0)
        parser.add_argument("--weight-det-regression", type=float, default=0.1)
        parser.add_argument("--weight-det-classification", type=float, default=0.1)
        parser.add_argument("--weight-det-masked", type=float, default=0.0)
        parser.add_argument("--weight-det-objectness", type=float, default=0.1)
        parser.add_argument("--weight-det-rpn-box-reg", type=float, default=0.1)
        parser.add_argument("--weight-det-bbox-ctrness", type=float, default=0.1)
        parser.add_argument("--image2image-model", type=str, default=None)
        parser.add_argument("--directly-coco", action="store_true")
        parser.add_argument("--limit-train-batches", type=float, default=1.0)
        parser.add_argument("--ablation-flag", action="store_true")
        parser.add_argument("--pre-train-path", type=str, default=None)
        parser.add_argument("--encoder-depth", type=int, default=5)
        parser.add_argument("--hallucidet-path", type=str, default=None)
        return parser.parse_args(argv)

    # ---- factories ----

    @staticmethod
    def config_optimizer(
        optimizer: str = "adamw",
        lr: float = 1e-5,
        momentum: float = 0.9,
        weight_decay: float = 0.0005,
    ) -> Optional[optax.GradientTransformation]:
        """optax equivalents of the reference's torch optimizers (reference:
        src/config/config.py:205-245). Wrapped in inject_hyperparams so the
        plateau scheduler can rescale lr between epochs without recompiling."""
        table = {
            "sgd": lambda lr: optax.sgd(lr, momentum=momentum)
            if weight_decay == 0
            else optax.chain(
                optax.add_decayed_weights(weight_decay), optax.sgd(lr, momentum=momentum)
            ),
            "adam": lambda lr: optax.adam(lr),
            "adamw": lambda lr: optax.adamw(lr),
            "lion": lambda lr: optax.lion(lr),
            "adadelta": lambda lr: optax.adadelta(lr),
        }
        if optimizer not in table:
            return None
        return optax.inject_hyperparams(table[optimizer])(lr=lr)

    @staticmethod
    def config_scheduler(mode="min", factor=0.1, patience=5):
        """ReduceLROnPlateau descriptor (applied by train.optim.PlateauScheduler;
        the reference returns the Lightning dict, config.py:248-260)."""
        return {
            "scheduler": "reduce_on_plateau",
            "mode": mode,
            "factor": factor,
            "patience": patience,
            "interval": "epoch",
            "monitor": "val_loss",
        }

    # ---- mutators ----

    @staticmethod
    def set_environment(args=None):
        if args is not None and getattr(args, "n_devices", None):
            Config.Environment.N_DEVICES = args.n_devices
        os.environ.setdefault("OMP_NUM_THREADS", Config.Environment.N_CORE)
        os.environ.setdefault("OPENBLAS_NUM_THREADS", Config.Environment.N_CORE)
        os.environ.setdefault("MKL_NUM_THREADS", Config.Environment.N_CORE)
        os.environ.setdefault("VECLIB_MAXIMUM_THREADS", Config.Environment.N_CORE)
        os.environ.setdefault("NUMEXPR_NUM_THREADS", Config.Environment.N_CORE)

    @staticmethod
    def set_dataset_path(dataset):
        paths = {
            "kaist": ("../datasets/kaist/train", None, "../datasets/kaist/test", ".png"),
            "llvip": ("../datasets/LLVIP/", None, "../datasets/LLVIP/", ".jpg"),
            "flir": (
                "../datasets/FLIR_aligned/", None, "../datasets/FLIR_aligned/", ".jpg",
            ),
        }
        train_path, valid_path, test_path, ext = paths.get(
            dataset, (None, None, None, ".png")
        )
        Config.Dataset.dataset = dataset
        Config.Dataset.train_path = train_path
        Config.Dataset.valid_path = valid_path
        Config.Dataset.test_path = test_path
        Config.Dataset.ext = ext
        Config.Dataset.n_classes = 2

    @staticmethod
    def set_detector(name, train_det=False, pretrained=False, score_threshold=0.5):
        Config.Detector.name = name
        Config.Detector.train_det = train_det
        Config.Detector.pretrained = pretrained
        Config.Detector.score_threshold = score_threshold
        Config.Detector.input_size = 640 if Config.Dataset.dataset == "flir" else 300
        Config.Losses.label_smoothing = 0.1 if Config.Dataset.dataset == "flir" else 0.0

    @staticmethod
    def set_loss_weights(args):
        w = Config.Losses.hparams_losses_weights
        if args.pixel is not None:
            Config.Losses.pixel = args.pixel
        if args.perceptual is not None:
            Config.Losses.perceptual = args.perceptual
        # Reference quirk preserved: a flag equal to its default is a no-op.
        if args.weight_pixel_rgb != 0.0:
            w["pixel_rgb"] = args.weight_pixel_rgb
        if args.weight_pixel_ir != 0.0:
            w["pixel_ir"] = args.weight_pixel_ir
        if args.weight_perceptual_rgb != 0.0:
            w["perceptual_rgb"] = args.weight_perceptual_rgb
        if args.weight_perceptual_ir != 0.0:
            w["perceptual_ir"] = args.weight_perceptual_ir
        if args.weight_det_regression != 0.1:
            w["det_regression"] = args.weight_det_regression
        if args.weight_det_classification != 0.1:
            w["det_classification"] = args.weight_det_classification
        if args.weight_det_masked != 0.0:
            w["det_masked"] = args.weight_det_masked
        if args.weight_det_objectness != 0.1:
            w["det_objectness"] = args.weight_det_objectness
        if args.weight_det_rpn_box_reg != 0.1:
            w["det_rpn_box_reg"] = args.weight_det_rpn_box_reg
        if args.weight_det_bbox_ctrness != 0.1:
            w["det_bbox_ctrness"] = args.weight_det_bbox_ctrness
