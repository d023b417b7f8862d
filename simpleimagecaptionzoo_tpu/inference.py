"""Shared bootstrap for the inference surfaces.

``tools/caption_images.py`` (offline directory batch) and
``tools/caption_server.py`` (HTTP serving) load the same things in the
same order: dataset config -> vocab -> model config -> best checkpoint ->
decode-dtype policy -> ONE jitted decode program.  This module is that
shared path, so a change to e.g. the int8 handling or the decode length
caps cannot silently apply to one surface and not the other.

The reference has no equivalent surface at all — its only inference entry
is the one-image-per-process ``sample`` op (reference Main.py:130-138).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any, Callable

import jax
import jax.numpy as jnp

from .config import DataConfig, ModelConfig, load_model_config
from .engine import steps as S
from .engine.checkpoint import CheckpointManager
from .models.base import get_captioner
from .vocab import Vocabulary, load_vocab

GREEDY_MAX_LEN = 20       # reference decode cap (Engine.py:260,286)
BEAM_MAX_LEN = 50         # reference beam step cap (NIC_Model.py:169)


@dataclass
class InferenceBundle:
    data_cfg: DataConfig
    model_cfg: ModelConfig
    vocab: Vocabulary
    model: Any
    tree: dict                      # {"params", "model_state"}
    decode: Callable                # decode(params, model_state, visual)
    beam: int
    dtype_name: str


def load_inference_bundle(*, dataset: str, model_type: str,
                          dataset_config_root: str, model_config_root: str,
                          checkpoint_root: str, use_scst_model: bool,
                          beam: int, dtype: str,
                          base_dir: str | None = None) -> InferenceBundle:
    """Load configs + vocab + the best checkpoint and build the decode fn.

    ``beam``: -1 for greedy, >= 1 for beam search (any other value exits).
    ``dtype``: float32 | bfloat16 | int8 (int8 = bf16 activations +
    weight-only int8 decode hot set, ops/quant.py).
    Raises SystemExit with a user-facing message on missing checkpoints /
    unusable model families, matching the historical CLI behavior.
    """
    data_cfg = DataConfig.from_data_file(
        os.path.join(dataset_config_root, dataset + ".data"),
        base_dir=base_dir or os.path.abspath(os.getcwd()),
        dataset_name=dataset)
    vocab = load_vocab(data_cfg.caption_vocab_path)
    model_cfg = load_model_config(
        os.path.join(model_config_root, model_type + ".json"),
        vocab_size=len(vocab))
    if model_cfg.uses_bu:
        raise SystemExit("Detection models need precomputed bottom-up "
                         "features; use a Spatial/NIC model for raw images.")
    model = get_captioner(model_cfg)
    ck = CheckpointManager(model_cfg.model_type, data_cfg.dataset_name,
                           root=checkpoint_root)
    template = {"params": model.init_params(jax.random.PRNGKey(0)),
                "model_state": model.init_model_state()}
    tree, _, _ = ck.load(template, scst=use_scst_model, best=True)
    if tree is None:
        raise SystemExit("no checkpoint found under " + ck.root_dir)

    jdtype = None if dtype == "float32" else jnp.bfloat16
    if dtype == "int8":
        tree = dict(tree,
                    params=model.quantize_decode_params(tree["params"]))
    if beam == -1:
        dec = S.make_greedy_decode(model, GREEDY_MAX_LEN, dtype=jdtype)
    elif beam >= 1:
        dec = S.make_beam_decode(model, beam, BEAM_MAX_LEN, dtype=jdtype)
    else:
        raise SystemExit(f"--beam must be -1 (greedy) or >= 1, got {beam}")
    return InferenceBundle(data_cfg=data_cfg, model_cfg=model_cfg,
                           vocab=vocab, model=model, tree=tree, decode=dec,
                           beam=beam, dtype_name=dtype)
