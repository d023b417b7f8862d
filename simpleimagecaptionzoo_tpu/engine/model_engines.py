"""Per-model Engine subclasses (reference ModelEngines/*.py).

The reference subclasses override two hooks: ``modify_visual_inputs``
(padding/masking bottom-up features — here handled uniformly by the static-
shape data layer, data/datasets.py) and ``show_additional_rlt`` (attention
visualization).  So only the visualization hook differs:

* NIC has no attention -> base no-op (NIC_Engine.py:3).
* Spatial models overlay the 7x7 attention grid (BUTD_Engine.py:9-18).
* Detection models paint attended bottom-up boxes (BUTD_Engine.py:49-59),
  loading the per-image bbox .npy from the supp dir.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

from simpleimagecaptionzoo_tpu.config import DataConfig, ModelConfig
from simpleimagecaptionzoo_tpu.engine.engine import Engine
from simpleimagecaptionzoo_tpu.utils.visualize import (visualize_att,
                                                       visualize_att_bboxes)


class NICEngine(Engine):
    pass  # no attention to visualize (reference NIC_Engine.py:3)


class _SpatialAttnEngine(Engine):
    def show_additional_rlt(self, alphas, visual_item: Dict,
                            caption: List[str]):
        if alphas is None or "img_tensors" not in visual_item:
            return
        image = np.asarray(visual_item["img_tensors"])
        t = len(caption)
        visualize_att(image, np.asarray(alphas)[:t], caption,
                      grid_side=self.cfg.enc_img_size,
                      save_path="attention_visualization.png")
        print("saved attention_visualization.png")


class _DetectionAttnEngine(Engine):
    def show_additional_rlt(self, alphas, visual_item: Dict,
                            caption: List[str]):
        if alphas is None:
            return
        bboxes = visual_item.get("bu_bboxes")
        if bboxes is None:
            return
        image = visual_item.get("original_image")
        if image is None:
            return
        t = len(caption)
        visualize_att_bboxes(np.asarray(image), np.asarray(alphas)[:t],
                             np.asarray(bboxes), caption,
                             save_path="attention_visualization.png")
        print("saved attention_visualization.png")


class BUTDSpatialEngine(_SpatialAttnEngine):
    pass


class BUTDDetectionEngine(_DetectionAttnEngine):
    pass


class AoASpatialEngine(_SpatialAttnEngine):
    pass


class AoADetectionEngine(_DetectionAttnEngine):
    pass


_ENGINES = {
    "NIC": NICEngine,
    "BUTDSpatial": BUTDSpatialEngine,
    "BUTDDetection": BUTDDetectionEngine,
    "AoASpatial": AoASpatialEngine,
    "AoADetection": AoADetectionEngine,
}


def get_engine(model_config: ModelConfig, data_config: DataConfig, vocab,
               **kwargs) -> Engine:
    """Engine factory (reference Main.py:38-63 if/elif chain)."""
    cls = _ENGINES.get(model_config.model_type, Engine)
    return cls(model_config, data_config, vocab, **kwargs)
