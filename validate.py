"""Offline validation / geo-ablation CLI (reference
``validation_utils/get_results_table.py`` main flow): sweep a validation
dataset with one or two configs, write per-sample metric CSV + GeoJSON, and
emit SatCLIP-vs-plain radar comparisons.

    python validate.py --config configs/config_px2px.yaml --max-samples 100
    python validate.py --compare configs/config_px2px_SatCLIP.yaml \
                       configs/config_px2px.yaml
"""

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default=None, help="single-model sweep")
    p.add_argument("--compare", nargs=2, metavar=("SATCLIP_CFG", "PLAIN_CFG"),
                   default=None, help="two-model sweep + radar plots")
    p.add_argument("--weights", default=None,
                   help="torch .ckpt/.pt or orbax run dir (--config mode)")
    p.add_argument("--weights-satclip", default=None,
                   help="weights for the SatCLIP model in --compare mode")
    p.add_argument("--weights-plain", default=None,
                   help="weights for the plain model in --compare mode")
    p.add_argument("--out", default="validation_metrics")
    p.add_argument("--max-samples", type=int, default=None)
    p.add_argument("--quant", choices=["none", "int8"], default=None,
                   help="override tpu.serving_quant in --config mode: sweep "
                        "the same weights with none vs int8 to QA the "
                        "quantised serving mode offline")
    args = p.parse_args()

    from nirgan_tpu.runtime import setup_runtime

    setup_runtime()

    from nirgan_tpu.validation.results_table import create_val_metrics, run_comparison

    if args.compare:
        folder, plots = run_comparison(args.compare[0], args.compare[1],
                                       out_root=args.out,
                                       max_samples=args.max_samples,
                                       satclip_weights=args.weights_satclip,
                                       plain_weights=args.weights_plain)
        print("wrote", folder)
        for pl in plots:
            print("  ", pl)
    elif args.config:
        import os

        os.makedirs(args.out, exist_ok=True)
        gdf = create_val_metrics(args.config, args.out,
                                 weights_path=args.weights,
                                 max_samples=args.max_samples,
                                 quant=args.quant)
        print(f"wrote {len(gdf)} per-sample rows to {args.out}")
    else:
        p.error("give --config or --compare")


if __name__ == "__main__":
    main()
