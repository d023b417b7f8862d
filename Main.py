"""Repo-root CLI shim — same invocation shape as the reference
(``python Main.py --dataset COCO14 --model_type NIC --operation train ...``)."""
import sys

from simpleimagecaptionzoo_tpu.main import build_argparser, main

if __name__ == "__main__":
    sys.exit(main(build_argparser().parse_args()))
