"""Export a trained checkpoint as a reference-loadable PyTorch ``.pth``.

Completes the migration story in both directions: the framework loads the
reference's published ``.pth`` weights directly (models/convert.py
``load_torch_checkpoint``), and this tool writes weights the reference's
``train.py -w`` / ``infer.py -w`` can strict-load back.

Usage:
    python tools/export_weights.py -c orienmask_yolo_coco_544_anchor4_fpn_plus \
        -w checkpoints/best_model.ckpt -o orienmask_yolo_export.pth
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("-c", "--config", required=True,
                    help="train config name (model architecture)")
    ap.add_argument("-w", "--weights", required=True,
                    help="framework .ckpt (or reference .pth) checkpoint")
    ap.add_argument("-o", "--output", required=True, help="output .pth path")
    args = ap.parse_args()

    import orienmask_tpu.config as config_module
    from orienmask_tpu.models.convert import export_torch_checkpoint
    from orienmask_tpu.trainer.builder import build, build_model
    from orienmask_tpu.trainer.checkpoint import load_checkpoint

    config = getattr(config_module, args.config)
    model_cfg = dict(config["model"])
    model_cfg["pretrained"] = None
    import orienmask_tpu.models as model_module

    model = build(model_cfg, model_module)
    ckpt = load_checkpoint(args.weights, model)
    variables = {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
    export_torch_checkpoint(model, variables, args.output)
    print(f"exported {args.weights} -> {args.output} "
          f"(reference-layout torch state_dict)")


if __name__ == "__main__":
    main()
