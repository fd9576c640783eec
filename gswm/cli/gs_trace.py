"""Attribution CLI — who generated this image?

Inverts each image once, then ranks every registry record (info_data.jsonl
from gs_embed / the node / script front-ends — or a parsed reference
info_data.txt) by decode accuracy using the native C++ hot path.  The
serving-side complement of gs_extract (BASELINE config 5).
"""

from __future__ import annotations

import argparse
import glob
import json
import os


def build_parser():
    p = argparse.ArgumentParser(description="Attribute images to registry keys")
    p.add_argument("--registry", required=True,
                   help="info_data.jsonl or reference info_data.txt")
    p.add_argument("--images_directory_path", default="")
    p.add_argument("--single_image_path", default="")
    p.add_argument("--model_dir", default="")
    p.add_argument("--model_id", default="stabilityai/stable-diffusion-2-1-base")
    p.add_argument("--num_inference_steps", type=int, default=30)
    p.add_argument("--scheduler", default="DDIM", choices=["DDIM", "DPMs"])
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--message_length", type=int, default=256)
    p.add_argument("--l", type=int, default=1)
    p.add_argument("--min_accuracy", type=float, default=0.0,
                   help="report 'unattributed' below this accuracy")
    p.add_argument("--out_jsonl", default="attributions.jsonl")
    return p


def load_registry(path: str) -> list[dict]:
    if path.endswith(".jsonl"):
        from gswm.utils.io import load_jsonlines

        return load_jsonlines(path)
    from gswm.eval.registry import parse_info_data_txt

    recs = parse_info_data_txt(path)
    return [
        {"key_hex": r["key"], "nonce_hex": r["nonce"],
         "message_hex": r["message"],
         "message_length": int(r.get("message_length") or 0) or None}
        for r in recs if "key" in r
    ]


def main(argv=None):
    from gswm.utils.platform import apply_platform_env

    apply_platform_env()
    args = build_parser().parse_args(argv)
    records = load_registry(args.registry)
    if not records:
        raise SystemExit(f"no records in {args.registry}")

    import numpy as np

    from gswm.cli.gs_extract import _MODEL_PRESETS, load_images
    from gswm.eval.trace import find_source
    from gswm.pipelines import InversablePipeline

    preset = _MODEL_PRESETS.get(args.model_id, args.model_id)
    pipe = InversablePipeline(preset, model_dir=args.model_dir or None)

    if args.single_image_path:
        paths = [args.single_image_path]
    else:
        paths = sorted(
            glob.glob(os.path.join(args.images_directory_path, "*.png"))
            + glob.glob(os.path.join(args.images_directory_path, "*.jpg"))
        )

    with open(args.out_jsonl, "a") as out:
        for path in paths:
            imgs = load_images([path], (args.width, args.height))
            z = pipe.invert(images=imgs,
                            num_steps=args.num_inference_steps,
                            scheduler=args.scheduler)
            best, acc, _ = find_source(np.asarray(z)[0], records,
                                       message_bits=args.message_length,
                                       l=args.l)
            rec = records[best] if acc >= args.min_accuracy else None
            line = {
                "image": os.path.basename(path),
                "best_index": best if rec else None,
                "accuracy": acc,
                "key_hex": rec["key_hex"] if rec else None,
                "message_hex": rec["message_hex"] if rec else None,
            }
            out.write(json.dumps(line) + "\n")
            print(f"{line['image']}: "
                  + (f"record {best} acc {acc:.4f}" if rec else
                     f"unattributed (best acc {acc:.4f})"))


if __name__ == "__main__":
    main()
