"""Export a framework checkpoint as a reference-loadable PyTorch ``.pth``.

The inverse of ``tools/convert_reference_checkpoint.py``: reads this
framework's msgpack checkpoint (reference directory layout,
/root/reference/Engine.py:81-88) and writes a torch state_dict with the
reference modules' exact key names (Models/{NIC,BUTD,AoA}_Model.py), so a
model trained here can be loaded by the reference with strict
``load_state_dict`` — and so converter round trips
(export -> convert -> identical CIDEr) are checkable end to end.

    python tools/export_reference_checkpoint.py \
        --model_config Configs/Models/BUTDDetection.json --vocab_size 10102 \
        --dataset Flickr8K [--checkpoint_root ./CheckPoints] [--scst] \
        [--best] --out /path/to/Captioner_cp.pth
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_config", required=True,
                    help="Configs/Models/<model>.json the checkpoint was "
                         "trained with (sets the template tree's shapes)")
    ap.add_argument("--vocab_size", type=int, required=True)
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--scst", action="store_true",
                    help="read the SCST checkpoint slot")
    ap.add_argument("--best", action="store_true",
                    help="read best/ instead of cp/")
    ap.add_argument("--checkpoint_root", default="./CheckPoints")
    ap.add_argument("--out", required=True, help="output .pth path")
    args = ap.parse_args()

    import jax
    import numpy as np

    from simpleimagecaptionzoo_tpu.config import load_model_config
    from simpleimagecaptionzoo_tpu.convert_reference import \
        save_reference_checkpoint
    from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager
    from simpleimagecaptionzoo_tpu.models.base import get_captioner

    cfg = load_model_config(args.model_config, args.vocab_size)
    model = get_captioner(cfg)
    template = {"params": model.init_params(jax.random.PRNGKey(0)),
                "model_state": model.init_model_state()}
    mgr = CheckpointManager(cfg.model_type, args.dataset,
                            root=args.checkpoint_root)
    tree, _, _ = mgr.load(template, scst=args.scst, best=args.best)
    if tree is None:
        raise SystemExit(f"no checkpoint found under {args.checkpoint_root} "
                         f"(scst={args.scst}, best={args.best})")
    save_reference_checkpoint(args.out, tree["params"], tree["model_state"],
                              cfg.model_type)
    n = sum(int(np.prod(np.shape(x)))
            for x in jax.tree_util.tree_leaves(tree["params"]))
    print(f"exported {cfg.model_type} ({n:,} parameters) -> {args.out}")


if __name__ == "__main__":
    main()
