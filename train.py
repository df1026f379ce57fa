"""Training CLI — same argv contract as the reference (``train.py:17-26``):

    python train.py --satclip y      # SatCLIP-conditioned cGAN (flagship)
    python train.py --satclip n      # plain Pix2Pix cGAN
    python train.py --baseline y     # baseline regressors

Config selection mirrors ``train.py:32-42``; checkpoint warm-start/resume
mirror ``train.py:60-71`` (reference torch .ckpt files load through the
converter).  Everything below the CLI is the TPU-native stack: fused jitted
GAN step, data-parallel mesh, orbax checkpoints, plateau schedulers.
"""

import argparse


def str2bool(value):
    if isinstance(value, bool):
        return value
    if value.lower() in {"true", "t", "yes", "y", "1"}:
        return True
    if value.lower() in {"false", "f", "no", "n", "0"}:
        return False
    raise argparse.ArgumentTypeError(f"Invalid boolean value: {value}")


def main():
    parser = argparse.ArgumentParser(description="Training script for NIR-GAN (TPU).")
    parser.add_argument("--satclip", required=False, default=True,
                        help="Enable satclip (default: True)")
    parser.add_argument("--baseline", required=False, default=False,
                        help="Train Baseline Model (default: False)")
    parser.add_argument("--config", required=False, default=None,
                        help="Explicit config path (overrides flag-based selection)")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--resume", default=None, metavar="RUN_DIR",
                        help="resume the full train state from a previous "
                             "experiment dir (sets Model.load_checkpoint)")
    args = parser.parse_args()
    args.satclip = str2bool(args.satclip)
    args.baseline = str2bool(args.baseline)

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()

    from nirgan_tpu.config import load_config

    if args.config:
        config = load_config(args.config)
    elif args.baseline:
        print("Baseline:", args.baseline)
        config = load_config("configs/config_baselines.yaml")
    else:
        print("Satclip:", args.satclip)
        config = load_config("configs/config_px2px_SatCLIP.yaml" if args.satclip
                             else "configs/config_px2px.yaml")

    if args.baseline or "model_name" in config.base_configs:
        from nirgan_tpu.tasks.baseline import BaselineTask

        task = BaselineTask(config)
    else:
        from nirgan_tpu.tasks import Px2PxTask

        task = Px2PxTask(config)

    if args.resume:
        config.custom_configs.Model.load_checkpoint = args.resume

    from nirgan_tpu.data import dataset_selector
    from nirgan_tpu.train.trainer import Trainer

    dm = dataset_selector(config)
    trainer = Trainer(task, dm, config, max_steps=args.max_steps)
    print("Experiment Path:", trainer.logdir)
    trainer.fit()
    trainer.logger.close()


if __name__ == "__main__":
    main()
