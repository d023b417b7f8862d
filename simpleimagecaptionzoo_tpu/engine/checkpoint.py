"""Checkpoint subsystem (reference Engine.py:43-88 layout, SURVEY.md §2a #14).

On-disk layout matches the reference so tooling/expectations carry over:

    CheckPoints/Model_<model_type>_Dataset_<ds>/
        cp/Captioner_[scst_]cp.msgpack        latest weights (flax msgpack
                                              instead of torch .pth)
        cp/[scst_]state_histories.json        {"cider_his": [...]}; resume
                                              epoch = len+1 (Engine.py:60-69)
        best/Captioner_[scst_]cp.msgpack      best-on-val weights
        best/[best_score_record|best_scst_score_record].json   {"cider": x}

Divergence fixed on purpose (SURVEY.md §2a #14): the reference *writes* the
SCST best score to ``best/Captioner_scst_cp_score.json`` but *reads*
``best_scst_score_record.json`` (Engine.py:243 vs :77), so its SCST best
gate never engages across restarts.  Here both sides use
``best_scst_score_record.json``.

Only model params + model_state are checkpointed — the reference rebuilds
the optimizer every epoch, so optimizer state is deliberately not persisted
(Engine.py:135-138)."""
from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple

import flax.serialization
import jax
import numpy as np


def _tag(model_type: str, dataset_name: str) -> str:
    return f"Model_{model_type}_Dataset_{dataset_name}"


class CheckpointManager:
    def __init__(self, model_type: str, dataset_name: str,
                 root: str = "./CheckPoints") -> None:
        self.root_dir = os.path.join(root, _tag(model_type, dataset_name))
        self.cp_dir = os.path.join(self.root_dir, "cp")
        self.best_dir = os.path.join(self.root_dir, "best")
        os.makedirs(self.cp_dir, exist_ok=True)
        os.makedirs(self.best_dir, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _weights(self, d: str, scst: bool) -> str:
        return os.path.join(d, "Captioner_%scp.msgpack" % ("scst_" if scst else ""))

    def _histories(self, scst: bool) -> str:
        return os.path.join(self.cp_dir,
                            "%sstate_histories.json" % ("scst_" if scst else ""))

    def _best_record(self, scst: bool) -> str:
        name = "best_scst_score_record.json" if scst else "best_score_record.json"
        return os.path.join(self.best_dir, name)

    # -- save ----------------------------------------------------------------
    @staticmethod
    def _atomic_write(path: str, data, binary: bool) -> None:
        """tmp + os.replace: these paths overwrite the run's ONLY copy of
        the latest/best weights, so a crash mid-write (preemption, OOM-kill)
        must leave the previous complete file, not a truncated one."""
        tmp = "%s.tmp.%d" % (path, os.getpid())
        if binary:
            with open(tmp, "wb") as f:
                f.write(data)
        else:
            with open(tmp, "w") as f:
                json.dump(data, f)
        os.replace(tmp, path)

    def save(self, tree: Any, cider_history: list, scst: bool = False) -> None:
        """Latest checkpoint + cider history (reference save_checkpoint,
        Engine.py:81-88).  ``tree`` = {'params':..., 'model_state':...}."""
        host = jax.tree_util.tree_map(np.asarray, tree)
        self._atomic_write(self._weights(self.cp_dir, scst),
                           flax.serialization.to_bytes(host), binary=True)
        self._atomic_write(self._histories(scst),
                           {"cider_his": list(map(float, cider_history))},
                           binary=False)

    def save_best(self, tree: Any, cider: float, scst: bool = False) -> None:
        host = jax.tree_util.tree_map(np.asarray, tree)
        self._atomic_write(self._weights(self.best_dir, scst),
                           flax.serialization.to_bytes(host), binary=True)
        self._atomic_write(self._best_record(scst), {"cider": float(cider)},
                           binary=False)

    # -- load ----------------------------------------------------------------
    def load(self, template: Any, scst: bool = False, best: bool = False
             ) -> Tuple[Optional[Any], list, int]:
        """Returns (tree or None, cider_history, start_epoch) with the
        reference's fallback semantics (Engine.py:43-70): best-if-asked, else
        latest; resume epoch = len(cider_his) + 1."""
        if best:
            path = self._weights(self.best_dir, scst)
            if os.path.exists(path):
                with open(path, "rb") as f:
                    tree = flax.serialization.from_bytes(template, f.read())
                return tree, [], 1
            print("best %scheckpoint not found; falling back to latest."
                  % ("scst " if scst else ""))
        cider_his: list = []
        if os.path.exists(self._histories(scst)):
            with open(self._histories(scst)) as f:
                cider_his = json.load(f)["cider_his"]
        path = self._weights(self.cp_dir, scst)
        tree = None
        if os.path.exists(path):
            with open(path, "rb") as f:
                tree = flax.serialization.from_bytes(template, f.read())
        else:
            # reference Engine.py:68 prints and proceeds on the current
            # weights; keep that behavior but make the consequence explicit —
            # callers (train resume, SCST init, eval) otherwise continue on
            # randomly initialized params with nothing in the log
            print("WARNING: recent %scheckpoint not found in %s — "
                  "proceeding with the CURRENT (e.g. freshly initialized) "
                  "weights." % ("scst " if scst else "", self.cp_dir))
        return tree, cider_his, len(cider_his) + 1

    # -- mid-epoch (crash tolerance beyond the reference) ----------------------
    # The reference checkpoints at epoch boundaries only, so a crash loses
    # the whole epoch (SURVEY.md §5 "Failure detection").  These methods add
    # an opt-in step-level checkpoint: params + model_state + OPTIMIZER state
    # (the reference never persists it, but mid-epoch the momenta matter) +
    # a json sidecar carrying the exact resume point (epoch, steps done, the
    # engine's jax rng key).  Writes are atomic (tmp + os.replace) so a
    # crash DURING a save can't corrupt the previous resume point.
    def _midepoch_prefix(self, scst: bool) -> str:
        return "midepoch_%s" % ("scst_" if scst else "")

    def _midepoch_meta(self, scst: bool) -> str:
        return os.path.join(self.cp_dir,
                            self._midepoch_prefix(scst) + "state.json")

    def save_midepoch(self, tree: Any, meta: dict, scst: bool = False) -> None:
        """tree = {'params','model_state','opt_state'};
        meta = {'epoch','steps_done','rng',...} (json-serializable).

        The weights land in a per-resume-point file whose name the meta
        records, and the meta swap (os.replace) is the commit point — a
        crash anywhere leaves the previous meta still referencing its own
        complete weights file (never new weights with a stale resume
        point)."""
        host = jax.tree_util.tree_map(np.asarray, tree)
        wname = "%scp.e%ds%d.msgpack" % (self._midepoch_prefix(scst),
                                         int(meta["epoch"]),
                                         int(meta["steps_done"]))
        wpath = os.path.join(self.cp_dir, wname)
        tmp = wpath + ".tmp"
        with open(tmp, "wb") as f:
            f.write(flax.serialization.to_bytes(host))
        os.replace(tmp, wpath)
        mpath = self._midepoch_meta(scst)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(dict(meta, weights=wname), f)
        os.replace(tmp, mpath)          # commit point
        self._prune_midepoch(scst, keep=wname)

    def _prune_midepoch(self, scst: bool, keep: Optional[str]) -> None:
        prefix = self._midepoch_prefix(scst) + "cp."
        for name in os.listdir(self.cp_dir):
            # also sweep ".msgpack.tmp" orphans left by a crash during a
            # save (between the tmp write and its os.replace) — they are
            # multi-GB at production scale and nothing else removes them
            if (name.startswith(prefix)
                    and (name.endswith(".msgpack")
                         or name.endswith(".msgpack.tmp"))
                    and name != keep):
                try:
                    os.remove(os.path.join(self.cp_dir, name))
                except FileNotFoundError:
                    pass

    def load_midepoch(self, template: Any, scst: bool = False
                      ) -> Tuple[Optional[Any], Optional[dict]]:
        mpath = self._midepoch_meta(scst)
        if not os.path.exists(mpath):
            return None, None
        with open(mpath) as f:
            meta = json.load(f)
        wpath = os.path.join(self.cp_dir, meta.get("weights", ""))
        if not os.path.isfile(wpath):
            return None, None
        with open(wpath, "rb") as f:
            tree = flax.serialization.from_bytes(template, f.read())
        return tree, meta

    def clear_midepoch(self, scst: bool = False) -> None:
        try:
            os.remove(self._midepoch_meta(scst))
        except FileNotFoundError:
            pass                        # another process already cleared it
        self._prune_midepoch(scst, keep=None)

    def history_best(self, scst: bool = False) -> float:
        """Best val CIDEr across all runs (reference load_history_best_score,
        Engine.py:72-78)."""
        path = self._best_record(scst)
        if os.path.exists(path):
            with open(path) as f:
                return float(json.load(f)["cider"])
        return 0.0
