"""Mid-epoch crash tolerance (split out of engine.py, VERDICT r3 weak #7).

The reference loses the in-flight epoch on a crash (SURVEY.md §5); with
``--midepoch_save_steps N > 0`` the training loops save a step-level
resume point every N steps and ``training(start_from='checkpoint')``
continues from it bit-identically to an uninterrupted run
(tests/test_midepoch_resume.py).  Mixin methods expect the Engine
attributes ``train_cfg`` / ``data_cfg`` / ``ckpt`` / ``tree`` / ``_rng``
plus ``_place`` / ``_log`` / ``_is_writer``.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.data import datasets as datasets_mod
from simpleimagecaptionzoo_tpu.parallel import (barrier, host_read,
                                                processes_agree)


class MidEpochMixin:
    def _midepoch_enabled(self) -> bool:
        return self.train_cfg.midepoch_save_steps > 0

    def _midepoch_env(self, scst: bool, n_batches: int) -> dict:
        """Run-configuration fingerprint recorded with every resume point
        and checked at resume: the saved rng stream and skip_batches are
        only valid under the same batch size / seed / epoch length / image
        decoder, so a mismatch must discard the point instead of silently
        continuing on the wrong batches (ADVICE r2)."""
        from simpleimagecaptionzoo_tpu.data import _native_image
        tc = self.train_cfg
        return {"batch_size": int(tc.scst_train_batch_size if scst
                                  else tc.train_batch_size),
                "seed": int(tc.seed), "n_batches": int(n_batches),
                "img_size": int(tc.img_size),
                "image_ingest": str(tc.image_ingest),
                "native_loader": bool(_native_image.available()),
                # the loader's own predicate (shard AND index AND packed-from
                # identity), so the fingerprint can't say "packed" while
                # _VisualSource is actually decoding JPEGs (or vice versa)
                "packed_images": datasets_mod.packed_images_available(
                    self.data_cfg.data_dir, self.data_cfg.dataset_name,
                    self.data_cfg.image_root, img_size=tc.img_size)}

    def _save_midepoch(self, state, epoch: int, steps_done: int,
                       scst: bool, n_batches: int = -1) -> None:
        """Asynchronous: snapshots the state on DEVICE (a copy, so the
        training loop's buffer donation can't invalidate it), then a
        background thread does the device->host pull and the atomic write
        while training continues — the pull costs seconds per save through
        a slow D2H link (measured: ~17-20 s for 523 MB on the tunnel,
        docs/BENCHMARKS.md) and would otherwise stall the loop.  At most
        one save is in flight; epoch boundaries and exceptions join it
        (``_midepoch_join``), so an interrupt always leaves the newest
        completed resume point on disk.  A failed background save is
        reported loudly at the next join — crash tolerance must not
        degrade to a silent no-op."""
        import threading
        self._midepoch_join()
        snap = jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True) if hasattr(x, "dtype") else x,
            {"params": state.params, "model_state": state.model_state,
             "opt_state": state.opt_state})
        meta = {"epoch": int(epoch), "steps_done": int(steps_done),
                "rng": np.asarray(self._rng).tolist(),
                **self._midepoch_env(scst, n_batches)}

        if jax.process_count() > 1:
            # coordinated multi-host save: the host pull may need
            # cross-process collectives (model-axis-sharded predict head),
            # which must NOT run from a background thread concurrently with
            # the training stream — so the pull is synchronous, process 0 is
            # the single writer, and the barrier after the meta-rename is
            # the collective commit point (every process resumes from this
            # point or none does).
            host = jax.tree_util.tree_map(host_read, snap)
            if self._is_writer:
                self.ckpt.save_midepoch(host, meta, scst=scst)
            barrier("midepoch_save_commit")
            return

        def write():
            try:
                self.ckpt.save_midepoch(snap, meta, scst=scst)
            except BaseException as e:       # surfaced by _midepoch_join
                self._midepoch_error = e

        self._midepoch_thread = threading.Thread(target=write, daemon=False)
        self._midepoch_thread.start()

    def _midepoch_join(self) -> None:
        t = getattr(self, "_midepoch_thread", None)
        if t is not None and t.is_alive():
            t.join()
        self._midepoch_thread = None
        err = getattr(self, "_midepoch_error", None)
        if err is not None:
            self._midepoch_error = None
            print("ERROR: async mid-epoch checkpoint save FAILED — "
                  "a crash before the next successful save will lose "
                  f"this epoch's progress: {err!r}", flush=True)

    def _try_resume_midepoch(self, tx, start_epoch: int, scst: bool,
                             n_batches: int = -1):
        """Returns (opt_state or None, skip_batches).  On a hit, self.tree
        and self._rng are restored to the saved resume point."""
        # the template is built from the PLACED params, so its leaves carry
        # the mesh shardings the restored host arrays must be put back with
        # (params go through _place(); opt_state mirrors the template)
        target = tx.init(self.tree["params"])
        template = {"params": self.tree["params"],
                    "model_state": self.tree["model_state"],
                    "opt_state": target}
        tree, meta = self.ckpt.load_midepoch(template, scst=scst)
        found = tree is not None and int(meta.get("epoch", -1)) == start_epoch
        if found:
            # refuse a resume point recorded under a different run config:
            # the saved rng / skip_batches only reproduce the interrupted
            # epoch's batch stream under identical settings (ADVICE r2)
            want = self._midepoch_env(scst, n_batches)
            for key, expect in want.items():
                got = meta.get(key, expect)  # absent in pre-r3 metas: accept
                if got != expect:
                    self._log(f"mid-epoch resume point discarded: saved "
                              f"{key}={got!r} but this run has {key}="
                              f"{expect!r} — resuming from the epoch "
                              "boundary instead")
                    found = False
                    break
        # collective agreement point (reached by EVERY process): all
        # processes must restore the exact same resume point or none may —
        # a per-host filesystem where only process 0 holds the files, or
        # mixed stale copies, would otherwise silently fork the run
        if jax.process_count() > 1:
            if found:
                rng = (list(map(int, meta["rng"])) + [0] * 4)[:4]
                fp = np.asarray([1, int(meta["epoch"]),
                                 int(meta["steps_done"])] + rng, np.int64)
            else:
                fp = np.zeros((7,), np.int64)
            if not processes_agree(fp):
                if found:
                    self._log("mid-epoch resume point discarded: processes "
                              "disagree on its existence or content (is the "
                              "checkpoint directory on a shared "
                              "filesystem?) — resuming from the epoch "
                              "boundary instead")
                found = False
        if not found:
            return None, 0
        self.tree = {"params": tree["params"],
                     "model_state": tree["model_state"]}
        self._place()
        self._rng = jnp.asarray(meta["rng"], jnp.uint32)

        def _put(t, x):
            # mirror only explicit mesh placements (momenta inherit the
            # param NamedShardings through tx.init's zeros_like); scalar
            # leaves like optax's count stay uncommitted so jit places them
            sh = getattr(t, "sharding", None)
            if isinstance(sh, jax.sharding.NamedSharding):
                return jax.device_put(x, sh)
            return jnp.asarray(x)

        opt_state = jax.tree_util.tree_map(_put, target, tree["opt_state"])
        skip = int(meta["steps_done"])
        self._log(f"mid-epoch resume: epoch {start_epoch}, "
                  f"skipping {skip} completed steps")
        return opt_state, skip
