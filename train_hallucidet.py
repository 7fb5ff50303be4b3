#!/usr/bin/env python
"""HalluciDet training CLI — drop-in surface of the reference entry point
(reference: train_hallucidet.py): trains the IR->RGB hallucination U-Net
against a frozen RGB-pretrained detector's loss (+ optional reconstruction).

Example (reference README recipe):
    python train_hallucidet.py --pretrained --modality ir --dataset llvip \
        --batch 8 --lr 1e-4 --epochs 200 --optimizer adam \
        --detector-path detector_fasterrcnn_rgb.bin
"""

import os

import numpy as np

from hallucidet_tpu.config import Config
from hallucidet_tpu.data import MultiModalDataModule
from hallucidet_tpu.observability import WandbLogger, define_reference_metrics
from hallucidet_tpu.train import (
    CheckpointManager,
    EarlyStopping,
    HalluciDetModule,
    HalluciDetTrainConfig,
    PlateauScheduler,
    auto_remat,
    Trainer,
    load_pytree,
    save_pytree,
)


def main():
    args = Config.argument_parser()
    Config.set_environment(args)
    from hallucidet_tpu.observability import setup_debug

    setup_debug()  # HALLUCIDET_DEBUG_NANS=1 enables jit NaN guards
    if args.dataset is not None:
        Config.set_dataset_path(args.dataset)
    if args.train:
        Config.Dataset.train_path = args.train
    if args.test:
        Config.Dataset.test_path = args.test
    if args.ext:
        Config.Dataset.ext = args.ext
    Config.set_detector(
        args.detector, train_det=False, pretrained=args.pretrained,
        score_threshold=args.threshold,
    )
    Config.set_loss_weights(args)

    import jax

    seed = args.seed
    np.random.seed(seed)

    logger = WandbLogger(
        project=args.wandb_project, name=args.wandb_name,
        config={k: v for k, v in vars(args).items()},
    )
    define_reference_metrics(logger)

    # frozen detector weights (reference: train_hallucidet.py:102-115)
    detector_variables = None
    if args.detector_path:
        if os.path.isdir(args.detector_path):
            from hallucidet_tpu.detection import Detector

            det = Detector(
                name=args.detector, n_classes=args.n_classes,
                size=Config.Detector.input_size,
            )
            detector_variables = load_pytree(
                args.detector_path, target=det.init(jax.random.PRNGKey(0))
            )
        else:
            from hallucidet_tpu.interop import load_detector_variables

            detector_variables = load_detector_variables(
                args.detector_path, args.detector, args.n_classes
            )

    lr = args.lr if args.lr is not None else 1e-4  # reference: train_hallucidet.py:56
    # native U-Net frame sizes per dataset (LLVIP 1024x1280; FLIR/KAIST
    # ~512x640); unknown datasets assume the largest
    native_hw = {
        "llvip": (1024, 1280), "flir": (512, 640), "kaist": (512, 640)
    }.get(Config.Dataset.dataset, (1024, 1280))
    module = HalluciDetModule(
        HalluciDetTrainConfig(
            detector=args.detector,
            decoder_backbone=args.decoder_backbone,
            segmentation_head=args.segmentation_head,
            n_classes=args.n_classes,
            input_size=Config.Detector.input_size,
            lr=lr,
            optimizer=args.optimizer,
            gradient_clip_val=Config.Optimizer.gradient_clip_val,
            pixel=Config.Losses.pixel,
            perceptual=Config.Losses.perceptual,
            loss_weights=Config.Losses.hparams_losses_weights,
            precision=args.precision,
            # remat only when the no-remat activation footprint would
            # overflow HBM — bf16 batch-8 trains ~15% faster without it
            remat=auto_remat(args.precision, args.batch, native_hw),
        ),
        rng=jax.random.PRNGKey(seed),
        detector_variables=detector_variables,
    )
    if args.pre_train_path:  # resume hallucidet weights
        module.ed_variables = load_pytree(
            args.pre_train_path, target=module.ed_variables
        )

    dm = MultiModalDataModule(
        dataset=Config.Dataset.dataset,
        path_images_train_rgb=Config.Dataset.train_path,
        path_images_train_ir=Config.Dataset.train_path,
        path_images_test_rgb=Config.Dataset.test_path,
        path_images_test_ir=Config.Dataset.test_path,
        batch_size=args.batch,
        num_workers=args.num_workers,
        ext=Config.Dataset.ext,
        seed=seed,
        split_ratio_train_valid=Config.Dataset.train_valid_split,
        ablation_flag=args.ablation_flag,
        max_boxes=Config.Dataset.max_boxes,
    )

    ckpt_dir = os.path.join(
        "lightning_logs", args.wandb_project, args.wandb_name,
        f"{Config.Dataset.dataset}_{args.modality}_{args.detector}",
    )
    ckpt = CheckpointManager(ckpt_dir, monitor="val_map_hall", mode="max")
    trainer = Trainer(
        max_epochs=args.epochs,
        ckpt=ckpt,
        logger=logger,
        limit_train_batches=args.limit_train_batches,
        early_stopping=EarlyStopping(patience=5, mode="max"),
        plateau=PlateauScheduler() if Config.Optimizer.scheduler_on else None,
        seed=seed,
        n_devices=Config.Environment.N_DEVICES,
    )
    trainer.fit_hallucidet(module, dm)

    # final + best saves (reference: train_hallucidet.py:544-547)
    save_pytree(os.path.join(ckpt_dir, "encoder_decoder_pl"), module.ed_variables)
    best_state = (
        ckpt.restore("best", {
            "params": module.ed_variables["params"],
            "batch_stats": module.ed_variables.get("batch_stats", {}),
        })
        if ckpt.has("best")
        else None
    )
    results = trainer.test_hallucidet(
        module, dm,
        state=(best_state["params"], best_state["batch_stats"]) if best_state else None,
    )
    print(f"Test IR   AP@50: {results['map_ir']['map_50'] * 100:.2f}")
    print(f"Test RGB  AP@50: {results['map_rgb']['map_50'] * 100:.2f}")
    print(f"Test Hall AP@50: {results['map_hall']['map_50'] * 100:.2f}")
    logger.summary["checkpoint_dirpath"] = ckpt_dir
    logger.summary["best_val_map_hall"] = ckpt.best_metric
    logger.summary["best_epoch"] = ckpt.best_epoch
    logger.finish()


if __name__ == "__main__":
    main()
