"""Export a trained orbax checkpoint as a reference-loadable torch ``.ckpt``
(the reverse of the ``--ckpt``/``weights_path`` converter):

    python export_torch_ckpt.py --config configs/config_px2px.yaml \
        --ckpt logs/exp_NIR_GAN/<run>/best --out nirgan_tpu_model.ckpt

The written file carries a ``state_dict`` with ``netG.*``/``netD.*`` keys in
the reference's Sequential layout (``model/networks.py:341-370``) and loads
into the upstream torch stack with ``strict=True``
(tests/test_torch_export.py).
"""

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/config_px2px.yaml")
    p.add_argument("--ckpt", required=True,
                   help="orbax checkpoint dir (a run's best/ or last/)")
    p.add_argument("--out", default="exported_model.ckpt")
    p.add_argument("--no-discriminator", action="store_true",
                   help="export the generator only")
    args = p.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()
    import orbax.checkpoint as ocp

    from nirgan_tpu.config import load_config
    from nirgan_tpu.train.torch_convert import export_px2px_checkpoint

    config = load_config(args.config)
    restored = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
    params_g = restored.get("params_g")
    params_d = None if args.no_discriminator else restored.get("params_d")
    out = export_px2px_checkpoint(params_g, params_d, config, args.out)
    towers = [t for t, v in (("netG", params_g), ("netD", params_d))
              if v is not None]
    print(f"wrote {'+'.join(towers)} to {out}")


if __name__ == "__main__":
    main()
