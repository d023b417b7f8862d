"""Convert a reference PyTorch checkpoint into a framework checkpoint.

One-command CIDEr-parity bridge: point it at a reference
``Captioner_[scst_]cp.pth`` (torch state_dict, layout per
/root/reference/Engine.py:81-88) and it writes this framework's msgpack
checkpoint in the reference directory layout, ready for
``python Main.py --operation eval``.

    python tools/convert_reference_checkpoint.py \
        --pth /path/to/Captioner_cp.pth --model_type BUTDSpatial \
        --dataset COCO14 [--scst] [--best] [--checkpoint_root ./CheckPoints]

By default writes the "latest" slot (``cp/``); ``--best`` writes the
``best/`` slot instead (without touching score records or histories, so an
existing training run's bookkeeping is preserved).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.serialization
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pth", required=True,
                    help="reference Captioner_[scst_]cp.pth (torch state_dict)")
    ap.add_argument("--model_type", required=True,
                    choices=["NIC", "BUTDSpatial", "BUTDDetection",
                             "AoASpatial", "AoADetection"])
    ap.add_argument("--dataset", required=True,
                    help="dataset name for the checkpoint directory tag "
                         "(e.g. COCO14)")
    ap.add_argument("--scst", action="store_true",
                    help="write the SCST checkpoint slot")
    ap.add_argument("--best", action="store_true",
                    help="write best/ instead of cp/")
    ap.add_argument("--checkpoint_root", default="./CheckPoints")
    ap.add_argument("--no_strict", action="store_true",
                    help="tolerate unconsumed state_dict keys")
    args = ap.parse_args()

    from simpleimagecaptionzoo_tpu.convert_reference import \
        load_reference_checkpoint
    from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager

    params, model_state = load_reference_checkpoint(
        args.pth, args.model_type, strict=not args.no_strict)
    n_params = sum(int(np.prod(np.shape(x))) for x in
                   __import__("jax").tree_util.tree_leaves(params))
    print(f"converted {args.model_type}: {n_params:,} parameters"
          + ("" if model_state["cnn_stats"] is None
             else " (+ frozen CNN BN stats)"))

    mgr = CheckpointManager(args.model_type, args.dataset,
                            root=args.checkpoint_root)
    tree = {"params": params, "model_state": model_state}
    import jax
    host = jax.tree_util.tree_map(np.asarray, tree)
    out_dir = mgr.best_dir if args.best else mgr.cp_dir
    out = mgr._weights(out_dir, args.scst)
    with open(out, "wb") as f:
        f.write(flax.serialization.to_bytes(host))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
