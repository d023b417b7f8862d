"""Full-stack CLI training run on a generated shapes dataset.

Generates a Flickr-style dataset of colored-shape images with templated
captions ("a red circle above a blue square"), runs the real preprocessing
toolchain (Karpathy-json conversion, vocab build, CIDEr idf build), then
drives the actual CLI (`simpleimagecaptionzoo_tpu.main`) for XE training,
SCST fine-tuning, and beam-search evaluation — the complete reference
workflow (download → preprocess → train → scst_train → eval) end to end on
the TPU, from pixels to CIDEr.

    python examples/train_synthetic.py --root /tmp/synth --epochs 6
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COLORS = {"red": (220, 40, 40), "blue": (40, 60, 220),
          "green": (40, 180, 60), "yellow": (230, 210, 50)}
SHAPES = ["circle", "square", "triangle"]
RELS = ["above", "below"]


def _draw(draw, shape, color, cx, cy, r):
    box = (cx - r, cy - r, cx + r, cy + r)
    if shape == "circle":
        draw.ellipse(box, fill=color)
    elif shape == "square":
        draw.rectangle(box, fill=color)
    else:
        draw.polygon([(cx, cy - r), (cx - r, cy + r), (cx + r, cy + r)],
                     fill=color)


def caption_variants(c1, s1, rel, c2, s2):
    inv = "below" if rel == "above" else "above"
    return [
        f"a {c1} {s1} {rel} a {c2} {s2}",
        f"the {c1} {s1} is {rel} the {c2} {s2}",
        f"a {c2} {s2} {inv} a {c1} {s1}",
        f"there is a {c1} {s1} {rel} a {c2} {s2}",
        f"one {c1} {s1} sits {rel} one {c2} {s2}",
    ]


def generate_dataset(root: str, n_images: int, seed: int = 0) -> None:
    from PIL import Image, ImageDraw
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    images = []
    sid = 0
    for i in range(n_images):
        c1, c2 = rng.choice(list(COLORS), size=2, replace=False)
        s1, s2 = (SHAPES[int(j)] for j in rng.integers(0, 3, 2))
        rel = RELS[int(rng.integers(0, 2))]
        im = Image.new("RGB", (224, 224), (245, 245, 240))
        d = ImageDraw.Draw(im)
        top_y, bot_y = int(rng.integers(45, 70)), int(rng.integers(150, 180))
        y1, y2 = (top_y, bot_y) if rel == "above" else (bot_y, top_y)
        _draw(d, s1, COLORS[c1], int(rng.integers(70, 155)), y1,
              int(rng.integers(22, 38)))
        _draw(d, s2, COLORS[c2], int(rng.integers(70, 155)), y2,
              int(rng.integers(22, 38)))
        name = f"synth_{i:05d}.jpg"
        im.save(os.path.join(img_dir, name), quality=92)
        caps = caption_variants(c1, s1, rel, c2, s2)
        split = ("train" if i < n_images * 0.8
                 else "val" if i < n_images * 0.9 else "test")
        sents = [{"raw": c, "tokens": c.split()} for c in caps]
        images.append({"filename": name, "imgid": i, "split": split,
                       "sentids": list(range(sid, sid + 5)),
                       "sentences": sents})
        sid += 5
    with open(os.path.join(root, "dataset_synth.json"), "w") as f:
        json.dump({"images": images, "dataset": "synth"}, f)
    print(f"generated {n_images} images -> {img_dir}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="./SynthShapes")
    ap.add_argument("--model", default="NIC",
                    help="NIC (global pooling — cannot resolve above/below) "
                         "or BUTDSpatial (spatial attention, relational)")
    ap.add_argument("--n_images", type=int, default=600)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--scst_epochs", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--dims", type=int, default=256,
                    help="embed/hidden/atten width for the demo-scale model "
                         "json (the production 1024-d configs need far more "
                         "steps than a quick demo runs)")
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--cnn_lr", type=float, default=1e-4,
                    help="backbone finetune lr (the CLI's "
                         "--cnn_finetune_learning_rate)")
    ap.add_argument("--scst_lr", type=float, default=5e-5)
    ap.add_argument("--skip_scst", action="store_true")
    ap.add_argument("--skip_xe", action="store_true",
                    help="reuse the root's existing XE checkpoints (iterate "
                         "on SCST settings without retraining XE)")
    ap.add_argument("--gate", action="store_true",
                    help="quality gate: exit nonzero unless XE val CIDEr "
                         "exceeds --xe_cider_threshold AND SCST strictly "
                         "improves on the XE best (machine-checks the "
                         "framework's central quality claims each round)")
    ap.add_argument("--xe_cider_threshold", type=float, default=0.9)
    ap.add_argument("--gate_out", default="",
                    help="optional path for a one-line json gate record")
    args = ap.parse_args()
    root = os.path.abspath(args.root)

    if not os.path.exists(os.path.join(root, "dataset_synth.json")):
        generate_dataset(root, args.n_images)

    from preprocess.datasets_json_modification import convert_karpathy
    from preprocess.build_caption_vocab import build_from_annotations
    from preprocess.cider_idf_preprocess import build as build_idf

    convert_karpathy(os.path.join(root, "dataset_synth.json"), "Flickr8K",
                     tokenizer="karpathy", output_dir=root)
    ann = os.path.join(root, "modified_annotations")
    vocab_path = os.path.join(root, "caption_vocab.pkl")
    if not os.path.exists(vocab_path):
        build_from_annotations(os.path.join(ann, "captions_train.json"),
                               vocab_path, threshold=1)
        # write idf tables into the CLI's data_dir so the sample op's
        # CIDEr-D and SCST's device-table cache find them
        build_idf(os.path.join(ann, "captions_train.json"), "Flickr8K",
                  os.path.join(root, "Data"), vocab_path=vocab_path)

    # the real CLI, driven from a config dir inside the dataset root
    cfg_dir = os.path.join(root, "Configs", "Datasets")
    os.makedirs(cfg_dir, exist_ok=True)
    with open(os.path.join(cfg_dir, "Flickr8K.data"), "w") as f:
        f.write("image_root=/images/\n"
                "train_caption_path=/modified_annotations/captions_train.json\n"
                "val_caption_path=/modified_annotations/captions_val.json\n"
                "test_caption_path=/modified_annotations/captions_test.json\n"
                "data_dir=/Data/\n"
                "caption_vocab_path=/caption_vocab.pkl\n")
    os.makedirs(os.path.join(root, "Data"), exist_ok=True)
    # demo-scale model json (same format as Configs/Models/*.json)
    model_cfg_dir = os.path.join(root, "Configs", "Models")
    os.makedirs(model_cfg_dir, exist_ok=True)
    with open(os.path.join(model_cfg_dir, args.model + ".json"), "w") as f:
        json.dump({"model_type": args.model, "enc_img_size": 7,
                   "embed_dim": args.dims, "hidden_dim": args.dims,
                   "atten_dim": args.dims, "optimizer": "Adam"}, f)
    os.chdir(root)  # CLI resolves .data paths against cwd

    from simpleimagecaptionzoo_tpu.main import build_argparser, main as cli

    base = ["--dataset", "Flickr8K", "--model_type", args.model,
            "--dataset_config_root", cfg_dir,
            "--model_config_root", model_cfg_dir,
            "--train_batch_size", str(args.batch),
            "--eval_batch_size", str(args.batch),
            "--cnn_finetune_start", "0",
            "--learning_rate", str(args.lr),
            "--cnn_finetune_learning_rate", str(args.cnn_lr),
            "--scst_learning_rate", str(args.scst_lr),
            "--scst_train_batch_size", str(args.batch)]
    if args.skip_xe:
        print("== XE phase skipped (reusing existing checkpoints) ==")
    else:
        print("== XE training via CLI ==")
        cli(build_argparser().parse_args(
            base + ["--operation", "train", "--num_epochs",
                    str(args.epochs)]))
        print("== eval (beam=3) via CLI ==")
        cli(build_argparser().parse_args(
            base + ["--operation", "eval", "--eval_split", "test",
                    "--eval_beam_size", "3"]))
    if not args.skip_scst:
        print("== SCST via CLI ==")
        cli(build_argparser().parse_args(
            base + ["--operation", "scst_train",
                    "--scst_num_epochs", str(args.scst_epochs)]))
    print("== sample via CLI ==")
    cli(build_argparser().parse_args(
        base + ["--operation", "sample", "--eval_beam_size", "-1",
                "--img_filename", "synth_00000.jpg"]))

    if args.gate:
        best_dir = os.path.join(root, "CheckPoints",
                                f"Model_{args.model}_Dataset_Flickr8K",
                                "best")
        with open(os.path.join(best_dir, "best_score_record.json")) as f:
            xe_best = float(json.load(f)["cider"])
        scst_best = float("nan")
        scst_rec = os.path.join(best_dir, "best_scst_score_record.json")
        if not args.skip_scst and os.path.exists(scst_rec):
            with open(scst_rec) as f:
                scst_best = float(json.load(f)["cider"])
        ok = xe_best >= args.xe_cider_threshold and (
            args.skip_scst or scst_best > xe_best)
        record = {"gate": "PASS" if ok else "FAIL",
                  "model": args.model, "xe_val_cider": round(xe_best, 4),
                  "scst_val_cider": (None if scst_best != scst_best
                                     else round(scst_best, 4)),
                  "xe_threshold": args.xe_cider_threshold,
                  "epochs": args.epochs, "scst_epochs": args.scst_epochs,
                  "n_images": args.n_images}
        print("QUALITY_GATE:", json.dumps(record))
        if args.gate_out:
            with open(args.gate_out, "w") as f:
                json.dump(record, f)
        return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
