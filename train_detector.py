#!/usr/bin/env python
"""Detector pretraining CLI — drop-in surface of the reference entry point
(reference: train_detector.py): trains Faster R-CNN / RetinaNet / FCOS on
RGB or IR LLVIP/FLIR/KAIST, producing the frozen 'privileged' detector.

Example (reference README recipe):
    python train_detector.py --pretrained --modality rgb --dataset llvip \
        --batch 16 --lr 1e-4 --epochs 200 --optimizer adam
"""

import os

import numpy as np

from hallucidet_tpu.config import Config
from hallucidet_tpu.data import DetectorAugmentation, SingleModalDataModule
from hallucidet_tpu.observability import WandbLogger, define_reference_metrics
from hallucidet_tpu.train import (
    CheckpointManager,
    DetectorModule,
    DetectorTrainConfig,
    EarlyStopping,
    PlateauScheduler,
    Trainer,
    load_pytree,
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
        args.detector, train_det=True, pretrained=args.pretrained,
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

    # reference default: 1e-4, or 1e-5 when fine-tuning (train_detector.py:49)
    if args.lr is not None:
        lr = args.lr
    else:
        lr = 1e-5 if args.fine_tuning else 1e-4
    module = DetectorModule(
        DetectorTrainConfig(
            detector=args.detector,
            n_classes=args.n_classes,
            input_size=Config.Detector.input_size,
            modality=args.modality,
            lr=lr,
            optimizer=args.optimizer,
            gradient_clip_val=Config.Optimizer.gradient_clip_val,
            fine_tuning_lp=args.fine_tuning_lp,
            pretrained=args.pretrained,
            loss_weights=Config.Losses.hparams_losses_weights,
        ),
        rng=jax.random.PRNGKey(seed),
    )
    # --path feeds fine-tuning (reference: train_detector.py:46-47)
    pre_train_path = args.path if args.fine_tuning else None
    if pre_train_path or args.detector_path:
        path = pre_train_path or args.detector_path
        if os.path.isdir(path):
            module.variables = load_pytree(path, target=module.variables)
        else:
            module.variables = module.detector.load(path)

    dm = SingleModalDataModule(
        dataset=Config.Dataset.dataset,
        path_images_train=Config.Dataset.train_path,
        path_images_test=Config.Dataset.test_path,
        batch_size=args.batch,
        num_workers=args.num_workers,
        ext=Config.Dataset.ext,
        seed=seed,
        split_ratio_train_valid=Config.Dataset.train_valid_split,
        modality=args.modality,
        data_augmentation=DetectorAugmentation(),
        ablation_flag=args.ablation_flag,
        max_boxes=Config.Dataset.max_boxes,
    )

    ckpt_dir = os.path.join(
        "lightning_logs", args.wandb_project, args.wandb_name,
        f"{Config.Dataset.dataset}_{args.modality}_{args.detector}",
    )
    ckpt = CheckpointManager(ckpt_dir, monitor="val_map", mode="max")
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
    trainer.fit_detector(module, dm)

    best_params = module.variables["params"]
    if ckpt.has("best"):
        best_params = ckpt.restore("best", {"params": module.variables["params"]})[
            "params"
        ]
    results = trainer.test_detector(module, dm, params=best_params)
    print(f"Test AP@50 ({args.modality}): {results['map_50'] * 100:.2f}")
    print(f"Test mAP   ({args.modality}): {results['map'] * 100:.2f}")
    logger.summary["checkpoint_dirpath"] = ckpt_dir
    logger.summary["test_map_50"] = results["map_50"]
    logger.finish()


if __name__ == "__main__":
    main()
