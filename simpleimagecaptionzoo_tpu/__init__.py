"""simpleimagecaptionzoo_tpu — a TPU-native image-captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the PyTorch
reference ``zyj0021200/simpleImageCaptionZoo``:

* Model families: NIC, BUTD (Spatial/Detection), AoA (Spatial/Detection)
  (reference: Models/{NIC,BUTD,AoA}_Model.py), re-designed as pure-functional
  step functions driven by a single model-agnostic on-device decode engine.
* Training regimes: cross-entropy with label smoothing / scheduled sampling /
  staircase LR decay / staged CNN finetune (reference: Engine.py:91-188), and
  SCST self-critical REINFORCE with an **on-device CIDEr-D reward**
  (reference: Engine.py:191-272, Utils.py:291-367 — where the reward was a
  per-batch host round-trip).
* Decoding: greedy, multinomial sampling, and **batched** beam search — all
  ``lax.scan``/``lax.while_loop`` on device (the reference runs Python loops,
  beam search at batch size 1: NIC_Model.py:153-212).
* COCO-protocol evaluation (BLEU/METEOR/ROUGE-L/CIDEr/SPICE) with a
  pure-Python PTB-compatible tokenizer (+ optional C++ fast path), matching
  coco_caption's output format (reference: COCO_Eval_Utils.py).
* Checkpoint/resume with best-model tracking keyed on val CIDEr, matching the
  reference's on-disk layout (reference: Engine.py:43-88).
* Data-parallel (+ vocab-sharded tensor-parallel) scaling over a
  ``jax.sharding.Mesh`` — the reference is strictly single-GPU (Main.py:24).

Token id conventions follow the reference exactly (Build_caption_vocab.py:37-40):
``<pad>``=0, ``<sta>``=1, ``<end>``=2, ``<unk>``=3.
"""

__version__ = "0.1.0"

PAD_ID = 0
STA_ID = 1
END_ID = 2
UNK_ID = 3

from simpleimagecaptionzoo_tpu.vocab import Vocabulary  # noqa: E402,F401

# Persistent XLA compilation cache: cold-start compiles (60-140 s/program
# on TPU) become ~100 ms deserializations on every run after the first.
# Kill switch: SICZ_TPU_COMPILE_CACHE=0 (see utils/compile_cache.py).
from simpleimagecaptionzoo_tpu.utils.compile_cache import (  # noqa: E402
    enable_persistent_cache as _enable_persistent_cache,
)

_enable_persistent_cache()
