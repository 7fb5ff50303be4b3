#!/usr/bin/env python
"""HalluciDet evaluation CLI — drop-in surface of the reference entry point
(reference: eval_hallucidet.py): loads HalluciDet + detector checkpoints,
runs the LLVIP/FLIR test set, prints the three AP@50 numbers
(IR baseline / RGB oracle / Hallucination), the repo's golden benchmark
(reference README: 69.75 / 76.86 / 90.57 for llvip seed 123).

    python eval_hallucidet.py --dataset llvip --modality ir \
        --hallucidet-path hallucidet_llvip_seed123.ckpt \
        --detector-path fasterrcnn_rgb_llvip_seed123.ckpt
"""

import os

import numpy as np

from hallucidet_tpu.config import Config
from hallucidet_tpu.data import MultiModalDataModule
from hallucidet_tpu.train import (
    HalluciDetModule,
    HalluciDetTrainConfig,
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
    if args.test:
        Config.Dataset.test_path = args.test
    if args.train:
        Config.Dataset.train_path = args.train
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

    module = HalluciDetModule(
        HalluciDetTrainConfig(
            detector=args.detector,
            decoder_backbone=args.decoder_backbone,
            segmentation_head=args.segmentation_head,
            n_classes=args.n_classes,
            input_size=Config.Detector.input_size,
        ),
        rng=jax.random.PRNGKey(seed),
        detector_variables=detector_variables,
    )

    hall_path = args.hallucidet_path or args.image2image_model
    if hall_path:
        if os.path.isdir(hall_path):
            module.ed_variables = load_pytree(hall_path, target=module.ed_variables)
        else:
            from hallucidet_tpu.interop import load_encoder_decoder_variables

            module.ed_variables = load_encoder_decoder_variables(
                hall_path,
                encoder_name=args.decoder_backbone,
                classes=3,
                head=args.segmentation_head,
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

    trainer = Trainer(
        max_epochs=0, seed=seed, n_devices=Config.Environment.N_DEVICES
    )
    results = trainer.test_hallucidet(module, dm)
    # reference print order (eval_hallucidet.py:180-182)
    print(f"AP@50 IR  : {results['map_ir']['map_50'] * 100:.2f}")
    print(f"AP@50 RGB : {results['map_rgb']['map_50'] * 100:.2f}")
    print(f"AP@50 Hall: {results['map_hall']['map_50'] * 100:.2f}")


if __name__ == "__main__":
    main()
