"""Training / eval / sample orchestration (reference Engine.py:16-341).

The externally observable behavior matches the reference Engine:

* ``training``    — XE epochs with staircase LR decay, staged CNN finetune,
  scheduled-sampling schedule, per-epoch val decode -> coco_eval -> CIDEr ->
  double-gated best-checkpoint save (Engine.py:91-167).
* ``scst_training`` — loads the best XE checkpoint, fixed-LR REINFORCE with
  CIDEr-D self-critical reward, same per-epoch eval/best gating
  (Engine.py:191-249).  Unlike the reference, both rollouts AND the reward
  run on device in one jitted step (engine/steps.py), and CNN finetune
  actually engages (the reference calls a misspelled ``cnn_fine_tune`` which
  silently no-ops, Engine.py:208; divergence documented in SURVEY.md §2b).
* ``eval`` / ``test`` — checkpoint selection + caption json generation +
  coco_eval[_specific]; single-image sample with CIDEr-D and attention
  visualization hook (Engine.py:302-341).

Everything device-side is one of four jitted programs (XE step, SCST step,
greedy decode, beam decode), compiled once and reused across epochs; the
host loop only schedules, feeds (prefetched) batches, detokenizes and
checkpoints.
"""
from __future__ import annotations

import functools
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from simpleimagecaptionzoo_tpu.config import (DataConfig, ModelConfig,
                                              TrainConfig)
from simpleimagecaptionzoo_tpu.data.caption_data import CaptionData
from simpleimagecaptionzoo_tpu.data import datasets as datasets_mod
from simpleimagecaptionzoo_tpu.data.datasets import (CaptionEvalBatches,
                                                     CaptionTrainBatches,
                                                     CaptionTrainSCSTBatches,
                                                     SuppFeatureLoader,
                                                     _VisualSource)
from simpleimagecaptionzoo_tpu.data.loader import Prefetcher
from simpleimagecaptionzoo_tpu.engine import steps as S
from simpleimagecaptionzoo_tpu.engine.checkpoint import CheckpointManager
from simpleimagecaptionzoo_tpu.engine.midepoch import MidEpochMixin
from simpleimagecaptionzoo_tpu.engine.multihost import MultiHostMixin
from simpleimagecaptionzoo_tpu.engine.observe import ObservabilityMixin
from simpleimagecaptionzoo_tpu.engine.optim import make_grad_transform
from simpleimagecaptionzoo_tpu.engine.sample import SampleMixin
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.evalcap.coco_eval import (coco_eval,
                                                         coco_eval_specific)
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import cider as ops_cider
from simpleimagecaptionzoo_tpu.ops.cider import CiderDTable, RewardVocab
from simpleimagecaptionzoo_tpu.parallel import (barrier, get_mesh,
                                                host_read, place_params,
                                                replicate_tree, shard_batch)
from simpleimagecaptionzoo_tpu.vocab import Vocabulary


class Engine(ObservabilityMixin, MultiHostMixin, MidEpochMixin, SampleMixin):
    """One engine per (model config, dataset).  Subclasses may override
    :meth:`show_additional_rlt` for attention visualization — the same
    extension hook as the reference (Engine.py:341, README.md:66).

    Host-side support machinery lives in focused mixins (observe.py:
    logging/metrics/profiler; multihost.py: writer election + checkpoint
    agreement; midepoch.py: step-level crash tolerance; sample.py: the
    single-image test surface); this class holds the orchestration loops
    themselves."""

    def __init__(self, model_config: ModelConfig, data_config: DataConfig,
                 vocab: Vocabulary,
                 train_config: Optional[TrainConfig] = None,
                 use_bu: Optional[str] = None,
                 checkpoint_root: str = "./CheckPoints",
                 mesh=None, verbose: bool = True,
                 tqdm_visible: bool = True,
                 profile_dir: Optional[str] = None) -> None:
        self.cfg = model_config
        self.data_cfg = data_config
        self.train_cfg = train_config or TrainConfig()
        self.vocab = vocab
        self.use_bu = use_bu  # 'fixed' | 'adaptive' | None
        self.mesh = mesh if mesh is not None else get_mesh()
        self.verbose = verbose
        self.tqdm_visible = tqdm_visible and verbose
        self.model = get_captioner(model_config)
        self.model.ingest_out_size = self.train_cfg.img_size
        self.ckpt = CheckpointManager(model_config.model_type,
                                      data_config.dataset_name,
                                      root=checkpoint_root)
        self._rng = jax.random.PRNGKey(self.train_cfg.seed)
        params = self.model.init_params(self._next_rng())
        self.tree = {"params": params,
                     "model_state": self.model.init_model_state()}
        self._place()
        self._decoders: dict = {}
        self._capdata_cache: dict = {}
        self.profile_dir = profile_dir or None
        self._profile_state = 0        # 0 idle, 1 tracing, 2 done

    # ------------------------------------------------------------------ utils
    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _place(self):
        self.tree = {"params": place_params(self.mesh, self.tree["params"]),
                     "model_state": replicate_tree(self.mesh,
                                                   self.tree["model_state"])}

    def _visual_source(self, needs_images: Optional[bool] = None) -> _VisualSource:
        supp = None
        if self.cfg.uses_bu:
            supp = SuppFeatureLoader(self.data_cfg.data_dir, self.use_bu or
                                     "fixed", self.cfg.max_bu_len)
        if needs_images is None:
            needs_images = not self.cfg.uses_bu
        return _VisualSource(self.data_cfg.dataset_name,
                             self.data_cfg.image_root, needs_images, supp,
                             img_size=self.train_cfg.img_size,
                             packed_dir=self.data_cfg.data_dir,
                             ingest=self.train_cfg.image_ingest)

    def _capdata(self, split: str) -> CaptionData:
        path = {"train": self.data_cfg.train_caption_path,
                "val": self.data_cfg.val_caption_path,
                "test": self.data_cfg.test_caption_path}[split]
        if not path:
            raise ValueError(
                f"dataset {self.data_cfg.dataset_name} has no {split!r} "
                "split (COCO17 has train/val only)")
        # cached per split: the training loops re-enter the val split every
        # epoch, and re-parsing a multi-MB annotation json 30-50 times is
        # pure host stall between epochs (the file never changes mid-run)
        hit = self._capdata_cache.get(split)
        if hit is None:
            hit = CaptionData(annotation_file=path)
            self._capdata_cache[split] = hit
        return hit

    # --------------------------------------------------------------- decoding
    def _decoder(self, beam_size: int):
        """Cached jitted decode program: greedy when beam_size == -1
        (reference eval_beam_size convention), else batched beam."""
        key = ("beam", beam_size) if beam_size != -1 else ("greedy",)
        if key not in self._decoders:
            dtype = self._decode_dtype()
            if beam_size == -1:
                self._decoders[key] = S.make_greedy_decode(
                    self.model, self.train_cfg.decode_max_len, dtype=dtype)
            else:
                self._decoders[key] = S.make_beam_decode(
                    self.model, beam_size, self.train_cfg.beam_max_steps,
                    dtype=dtype)
        return self._decoders[key]

    def _train_dtype(self):
        choice = getattr(self.train_cfg, "train_dtype", "float32")
        if choice not in ("float32", "bfloat16"):
            raise ValueError(f"train_dtype must be 'float32' or 'bfloat16', "
                             f"got {choice!r}")
        return jnp.bfloat16 if choice == "bfloat16" else None

    def _decode_dtype(self):
        choice = self.train_cfg.decode_dtype
        if choice not in ("float32", "bfloat16", "int8"):
            raise ValueError(f"decode_dtype must be 'float32', 'bfloat16' or "
                             f"'int8', got {choice!r}")
        # int8 = bf16 activations + weight-only int8 hot set (ops/quant.py)
        return None if choice == "float32" else jnp.bfloat16

    def _decode_params(self):
        """Params tree handed to the jitted eval decode fns.  Under
        ``decode_dtype='int8'`` the decode-step hot weights are replaced by
        their weight-only int8 form (cached until the params change)."""
        params = self.tree["params"]
        if self.train_cfg.decode_dtype != "int8":
            return params
        if getattr(self, "_qparams_src", None) is not params:
            self._qparams = self.model.quantize_decode_params(params)
            self._qparams_src = params
        return self._qparams

    def eval_captions_json_generation(self, split: str = "val",
                                      eval_beam_size: int = -1,
                                      batch_size: Optional[int] = None,
                                      full_precision: bool = False
                                      ) -> List[dict]:
        """Decode a split into [{'image_id', 'caption'}, ...] (reference
        Engine.py:274-300).  Beam search stays batched — the reference
        forces batch 1 under beam (Utils.py:72-74); we don't have to.

        ``full_precision=True`` bypasses the weight-only int8 decode cache:
        the training loops pass it so per-epoch validation CIDEr — which
        drives best-checkpoint selection — always ranks models on the
        full-precision WEIGHTS even when ``--decode_dtype int8`` is set for
        serving (ADVICE r2).  Note the decode still runs in the configured
        decode dtype's activations (bf16 under ``int8``/``bfloat16``) — the
        int8 approximation is what model selection must not see; a user who
        chose bf16 decode gets bf16 validation by choice."""
        capdata = self._capdata(split)
        batches = CaptionEvalBatches(
            capdata, self._visual_source(),
            batch_size or self.train_cfg.eval_batch_size, split,
            process_index=jax.process_index(),
            process_count=jax.process_count())
        decode = self._decoder(eval_beam_size)
        results: List[dict] = []
        n_captions = 0
        t0 = time.perf_counter()
        # depth-2 decode pipeline: dispatch batch i+1 before synchronizing
        # batch i's ids, hiding the device->host round trip (which dominates
        # at ~30ms/call through the accelerator tunnel) behind decode compute
        pending: List[tuple] = []

        def drain(entry):
            nonlocal n_captions
            ids, g_ids, g_real = entry
            # multi-host: host_read all-gathers the decoded ids into the
            # GLOBAL batch; the image ids / real-row count come from the
            # batcher's global_* fields, which every process derives
            # identically from the shared capdata order — so this is the
            # drain's ONLY collective (two per-batch host_allgathers of
            # img_ids/n_real used to sit here, inside the latency-hiding
            # pipeline) and every process still assembles the identical
            # result set (hence identical best-checkpoint decisions).
            # Global row j is real iff j < global n_real (datasets.py).
            ids = host_read(ids)                     # sync point
            for j in range(int(g_real)):
                words = self.vocab.decode_ids(ids[j])
                results.append({"image_id": int(g_ids[j]),
                                "caption": " ".join(words)})
            n_captions += int(g_real)

        decode_params = (self.tree["params"] if full_precision
                         else self._decode_params())
        for batch in Prefetcher(batches.epoch).epoch():
            visual = shard_batch(self.mesh, batch["visual"])
            ids_dev = decode(decode_params,
                             self.tree["model_state"], visual)
            pending.append((ids_dev, batch["global_img_ids"],
                            batch["global_n_real"]))
            if len(pending) > 2:
                drain(pending.pop(0))
        for entry in pending:
            drain(entry)
        dt = time.perf_counter() - t0
        self._log(f"decoded {n_captions} captions in {dt:.1f}s "
                  f"({n_captions / max(dt, 1e-9):.1f} captions/sec)")
        return results

    # --------------------------------------------------------------- training
    def training(self, start_from: str = "scratch",
                 num_epochs: Optional[int] = None,
                 eval_beam_size: int = -1) -> List[float]:
        """XE training (reference Engine.py:91-167).  The wrapper joins any
        in-flight async mid-epoch save on every exit path, so even an
        interrupt leaves the newest completed resume point on disk."""
        try:
            return self._training_impl(start_from, num_epochs,
                                       eval_beam_size)
        finally:
            self._midepoch_join()

    def _training_impl(self, start_from: str = "scratch",
                       num_epochs: Optional[int] = None,
                       eval_beam_size: int = -1) -> List[float]:
        tc = self.train_cfg
        num_epochs = num_epochs or tc.num_epochs
        history_best = self.ckpt.history_best(scst=False)
        self._log("history best cider on val split w/o beam search: %.3f"
                  % history_best)
        cider_scores: List[float] = []
        start_epoch = 1
        if start_from == "checkpoint":
            tree, cider_scores, start_epoch = self.ckpt.load(
                self.tree, scst=False, best=False)
            self._check_multihost_ckpt(
                tree, (start_epoch, len(cider_scores)), "XE resume")
            if tree is not None:
                self.tree = tree
                self._place()
        else:
            self._log("training from scratch")
        best_cider = max(cider_scores) if cider_scores else 0.0
        best_epoch = (cider_scores.index(best_cider) + 1) if cider_scores else 0

        tx = make_grad_transform(tc.optimizer, tc.grad_clip)
        labels = self.model.param_labels(self.tree["params"])
        # one compilation per (frozen-cnn, ss-active) combination, built
        # lazily: frozen stop-gradients the backbone so its backward pass is
        # never built; ss_active=False elides the in-scan scheduled-sampling
        # head applications in the epochs before the schedule starts
        step_fns: Dict = {}

        def get_step(frozen: bool, ss_on: bool):
            key = (frozen, ss_on)
            if key not in step_fns:
                step_fns[key] = S.make_xe_train_step(
                    self.model, tx, labels, tc.label_smoothing,
                    freeze_cnn=frozen, compute_dtype=self._train_dtype(),
                    ss_active=ss_on)
            return step_fns[key]
        capdata = self._capdata("train")
        batches = CaptionTrainBatches(capdata, self.vocab,
                                      self._visual_source(),
                                      tc.train_batch_size,
                                      tc.max_caption_len, seed=tc.seed,
                                      process_index=jax.process_index(),
                                      process_count=jax.process_count())
        mid_on = self._midepoch_enabled()
        resume_opt, resume_skip = None, 0
        if mid_on:
            if start_from == "checkpoint":
                resume_opt, resume_skip = self._try_resume_midepoch(
                    tx, start_epoch, scst=False, n_batches=len(batches))
            else:
                if self._is_writer:
                    self.ckpt.clear_midepoch(scst=False)  # stale resume pt
                barrier("xe_clear_midepoch")
        state = TrainState.create(self.tree["params"], tx,
                                  model_state=self.tree["model_state"])

        cnn_ft_enabled = False
        for epoch in range(start_epoch, num_epochs + 1):
            if (epoch > tc.lr_opts.cnn_finetune_start
                    and self.cfg.uses_cnn):
                cnn_ft_enabled = True
            lr, cnn_lr = tc.lr_opts.lrs_for_epoch(
                epoch, self.cfg.uses_cnn, cnn_ft_enabled)
            ss_prob = tc.ss_opts.prob_for_epoch(epoch)
            step_fn = get_step(self.cfg.uses_cnn and not cnn_ft_enabled,
                               ss_prob > 0.0)
            self._log(f"— epoch {epoch}: lr={lr:.6f} cnn_ft_lr={cnn_lr:.6f} "
                      f"ss_prob={ss_prob:.2f}")
            if resume_opt is not None and epoch == start_epoch:
                # resumed mid-epoch: the saved optimizer momenta replace the
                # per-epoch fresh optimizer (which already ran at epoch start)
                state = state.replace(opt_state=resume_opt)
                resume_opt = None
            else:
                # fresh optimizer each epoch (reference Engine.py:135-138)
                state = state.reset_optimizer(tx)
            skip = resume_skip if epoch == start_epoch else 0
            t0 = time.perf_counter()
            t_work = None             # set after the first call: jit compile
                                      # is synchronous, so the steps/sec
                                      # metric excludes it (epoch-1 rates
                                      # otherwise read ~0 under long
                                      # compiles and pollute metrics.jsonl)
            n_steps = skip            # absolute position within the epoch
            n_exec = 0
            loss_sum = 0.0
            monitor = self._monitor(
                Prefetcher(functools.partial(batches.epoch,
                                             epoch_index=epoch,
                                             skip_batches=skip)).epoch(),
                len(batches) - skip, f"XE epoch {epoch}")
            # loss readback lags 2 steps: synchronizing the host every step
            # costs ~34ms of device<->host round trip (see BENCHMARKS.md)
            pending: List = []
            for batch in monitor:
                batch = shard_batch(self.mesh, batch)
                state, metrics = step_fn(state, batch, self._next_rng(),
                                         ss_prob, lr, cnn_lr)
                if t_work is None:
                    # anchor AFTER step 1's device work (dispatch is async;
                    # returning from the call only proves the compile ran)
                    jax.block_until_ready(metrics["loss"])
                    t_work = time.perf_counter()
                n_steps += 1
                n_exec += 1
                self._profile_window(n_exec, metrics["loss"])
                if (mid_on and n_steps % tc.midepoch_save_steps == 0
                        and n_steps < len(batches)):
                    self._save_midepoch(state, epoch, n_steps, scst=False,
                                        n_batches=len(batches))
                pending.append(metrics["loss"])
                if len(pending) > 2:
                    loss = float(pending.pop(0))
                    loss_sum += loss
                    if hasattr(monitor, "set_postfix"):
                        monitor.set_postfix(Loss=round(loss, 4))
            loss_sum += sum(float(x) for x in pending)
            self._profile_close()
            n_steps = n_exec          # logging below reports executed steps
            dt = time.perf_counter() - t0
            rate = self._epoch_rate(n_exec, t0, t_work)
            self._log(f"  {n_steps} steps in {dt:.1f}s "
                      f"({rate:.2f} steps/sec, compile excluded), "
                      f"mean loss {loss_sum / max(n_steps, 1):.4f}")
            self.tree = {"params": state.params,
                         "model_state": state.model_state}
            results = self.eval_captions_json_generation(
                "val", eval_beam_size, full_precision=True)
            cider = coco_eval(results, self.data_cfg.val_caption_path)
            cider_scores.append(cider)
            self._log_metrics({"phase": "xe", "epoch": epoch,
                               "mean_loss": loss_sum / max(n_steps, 1),
                               "steps_per_sec": rate,
                               "lr": lr, "cnn_lr": cnn_lr,
                               "ss_prob": ss_prob, "val_cider": cider})
            # host pull BEFORE the writer gate: it may be collective
            # (model-axis-sharded head) so every process must participate
            host = self._host_tree()
            if cider > best_cider:
                if cider > history_best and self._is_writer:
                    self.ckpt.save_best(host, cider, scst=False)
                best_cider, best_epoch = cider, epoch
            if self._is_writer:
                self.ckpt.save(host, cider_scores, scst=False)
            if mid_on:
                self._midepoch_join()   # never clear under an in-flight save
                if self._is_writer:
                    self.ckpt.clear_midepoch(scst=False)  # epoch durable now
            barrier("xe_epoch_ckpt")    # writes durable before anyone reads
        self._log("Model of best epoch #:%d with CIDEr score %.3f"
                  % (best_epoch, best_cider))
        return cider_scores

    def scst_training(self, start_from: str = "scratch",
                      num_epochs: Optional[int] = None,
                      eval_beam_size: int = -1,
                      idf_cache: Optional[str] = None) -> List[float]:
        """SCST self-critical fine-tune (reference Engine.py:191-249).
        See :meth:`training` for the async-save join wrapper."""
        try:
            return self._scst_training_impl(start_from, num_epochs,
                                            eval_beam_size, idf_cache)
        finally:
            self._midepoch_join()

    def _scst_training_impl(self, start_from: str = "scratch",
                            num_epochs: Optional[int] = None,
                            eval_beam_size: int = -1,
                            idf_cache: Optional[str] = None) -> List[float]:
        tc = self.train_cfg
        num_epochs = num_epochs or tc.scst_num_epochs
        history_best = self.ckpt.history_best(scst=True)
        self._log("history best scst_cider on val: %.3f" % history_best)
        cider_scores: List[float] = []
        start_epoch = 1
        if start_from == "checkpoint":
            tree, cider_scores, start_epoch = self.ckpt.load(
                self.tree, scst=True, best=False)
            self._check_multihost_ckpt(
                tree, (start_epoch, len(cider_scores)), "SCST resume")
            if tree is not None:
                self.tree = tree
                self._place()
        else:
            self._log("loading best XE checkpoint before SCST...")
            tree, _, _ = self.ckpt.load(self.tree, scst=False, best=True)
            self._check_multihost_ckpt(tree, (), "best-XE load before SCST")
            if tree is not None:
                self.tree = tree
                self._place()
        best_cider = max(cider_scores) if cider_scores else 0.0
        best_epoch = (cider_scores.index(best_cider) + 1) if cider_scores else 0

        capdata = self._capdata("train")
        reward_vocab = RewardVocab(self.vocab)
        table = self._cider_table(capdata, reward_vocab, idf_cache)
        table_dev = table.device_arrays()

        batches = CaptionTrainSCSTBatches(capdata, reward_vocab,
                                          self._visual_source(),
                                          tc.scst_train_batch_size,
                                          num_refs=tc.scst_num_refs,
                                          max_ref_len=tc.scst_max_ref_len,
                                          seed=tc.seed,
                                          process_index=jax.process_index(),
                                          process_count=jax.process_count())
        # ref-side tf-idf norms are fixed per image: one device pass here
        # removes every ref idf gather from the per-step reward
        # (ops/cider.py:ref_norms_device)
        norms_jit = jax.jit(lambda i, l: ops_cider.ref_norms_device(
            table_dev, table.probe, i, l))
        t_norm = time.perf_counter()
        batches.precompute_ref_norms(
            lambda i, l: norms_jit(jnp.asarray(i), jnp.asarray(l)))
        self._log("precomputed SCST ref norms for %d images in %.1fs"
                  % (len(batches.img_ids), time.perf_counter() - t_norm))
        tx = make_grad_transform(tc.optimizer, tc.scst_grad_clip)
        labels = self.model.param_labels(self.tree["params"])
        step_fn = S.make_scst_train_step(self.model, tx, labels, table_dev,
                                         table.probe, tc.decode_max_len,
                                         compute_dtype=self._train_dtype())
        mid_on = self._midepoch_enabled()
        resume_opt, resume_skip = None, 0
        if mid_on:
            if start_from == "checkpoint":
                resume_opt, resume_skip = self._try_resume_midepoch(
                    tx, start_epoch, scst=True, n_batches=len(batches))
            else:
                if self._is_writer:
                    self.ckpt.clear_midepoch(scst=True)
                barrier("scst_clear_midepoch")
        state = TrainState.create(self.tree["params"], tx,
                                  model_state=self.tree["model_state"])
        if resume_opt is not None:
            # SCST keeps ONE optimizer across epochs (Engine.py:211-217),
            # so the restored momenta simply replace the fresh init
            state = state.replace(opt_state=resume_opt)
        lr = tc.scst_learning_rate
        # SCST always finetunes the CNN (reference intent, Engine.py:208-209)
        cnn_lr = (tc.scst_cnn_finetune_learning_rate
                  if self.cfg.uses_cnn else 0.0)

        for epoch in range(start_epoch, num_epochs + 1):
            self._log(f"— SCST epoch {epoch}: lr={lr:.6f} "
                      f"cnn_ft_lr={cnn_lr:.6f}")
            skip = resume_skip if epoch == start_epoch else 0
            t0 = time.perf_counter()
            t_work = None             # steps/sec excludes first-call compile
            n_steps = skip
            n_exec = 0
            reward_sum = 0.0
            monitor = self._monitor(
                Prefetcher(functools.partial(batches.epoch,
                                             epoch_index=epoch,
                                             skip_batches=skip)).epoch(),
                len(batches) - skip, f"SCST epoch {epoch}")
            pending: List = []        # lagged readback (see XE loop note)
            for batch in monitor:
                batch = shard_batch(self.mesh, batch)
                state, metrics = step_fn(state, batch, self._next_rng(),
                                         lr, cnn_lr)
                if t_work is None:
                    jax.block_until_ready(metrics["reward"])
                    t_work = time.perf_counter()
                n_steps += 1
                n_exec += 1
                self._profile_window(n_exec, metrics["reward"])
                if (mid_on and n_steps % tc.midepoch_save_steps == 0
                        and n_steps < len(batches)):
                    self._save_midepoch(state, epoch, n_steps, scst=True,
                                        n_batches=len(batches))
                pending.append(metrics["reward"])
                if len(pending) > 2:
                    reward = float(pending.pop(0))
                    reward_sum += reward
                    if hasattr(monitor, "set_postfix"):
                        monitor.set_postfix(Reward=round(reward, 4))
            reward_sum += sum(float(x) for x in pending)
            self._profile_close()
            n_steps = n_exec
            dt = time.perf_counter() - t0
            rate = self._epoch_rate(n_exec, t0, t_work)
            self._log(f"  {n_steps} SCST steps in {dt:.1f}s "
                      f"({rate:.2f} steps/sec, compile excluded), "
                      f"mean reward {reward_sum / max(n_steps, 1):.4f}")
            self.tree = {"params": state.params,
                         "model_state": state.model_state}
            results = self.eval_captions_json_generation(
                "val", eval_beam_size, full_precision=True)
            cider = coco_eval(results, self.data_cfg.val_caption_path)
            cider_scores.append(cider)
            self._log_metrics({"phase": "scst", "epoch": epoch,
                               "mean_reward": reward_sum / max(n_steps, 1),
                               "scst_steps_per_sec": rate,
                               "val_cider": cider})
            host = self._host_tree()    # collective: before the writer gate
            if cider > best_cider:
                if cider > history_best and self._is_writer:
                    self.ckpt.save_best(host, cider, scst=True)
                best_cider, best_epoch = cider, epoch
            if self._is_writer:
                self.ckpt.save(host, cider_scores, scst=True)
            if mid_on:
                self._midepoch_join()   # never clear under an in-flight save
                if self._is_writer:
                    self.ckpt.clear_midepoch(scst=True)
            barrier("scst_epoch_ckpt")  # writes durable before anyone reads
        self._log("Best SCST epoch #:%d CIDEr %.3f" % (best_epoch, best_cider))
        return cider_scores

    def _cider_table(self, capdata: CaptionData, reward_vocab: RewardVocab,
                     cache: Optional[str]) -> CiderDTable:
        """Train-split idf table for the on-device reward.  Built once from
        the modified annotations (same document frequencies as the
        reference's PreProcess/CIDEr_idf_preproccess.py pickle) and cached."""
        if cache and os.path.exists(cache):
            try:
                z = np.load(cache)
                if ("hash_version" in z
                        and int(z["hash_version"]) == ops_cider.HASH_VERSION):
                    return CiderDTable(z["h1"], z["h2"], z["df"],
                                       float(z["log_ref_len"]))
                self._log("idf table cache %s uses hash version %s != %d; "
                          "rebuilding" % (cache,
                                          int(z["hash_version"])
                                          if "hash_version" in z else "<pre-2>",
                                          ops_cider.HASH_VERSION))
            except Exception as e:        # truncated/corrupt npz -> rebuild
                self._log("idf table cache %s unreadable (%s: %s); "
                          "rebuilding" % (cache, type(e).__name__, e))
        corpus = ([reward_vocab.encode(s["tokens"]) for s in img["sentences"]]
                  for img in capdata.imgs.values())
        table = CiderDTable.from_ref_corpus(corpus)
        if cache:
            os.makedirs(os.path.dirname(cache) or ".", exist_ok=True)
            # atomic publish: on multi-host shared storage every process
            # rebuilds concurrently and np.savez truncates-then-writes, so a
            # plain write can leave a corrupt npz for the next reader.  Write
            # to a per-process tmp (pids are only unique per host — carry the
            # job-wide process index too) and os.replace into place.
            tmp = cache + ".tmp.%d.%d" % (jax.process_index(), os.getpid())
            with open(tmp, "wb") as f:
                np.savez(f, h1=table.h1, h2=table.h2, df=table.df,
                         log_ref_len=table.log_ref_len,
                         hash_version=ops_cider.HASH_VERSION)
            os.replace(tmp, cache)
        return table

    # ------------------------------------------------------------------- eval
    def eval(self, split: str = "test", eval_scst: bool = False,
             eval_best: bool = True, eval_beam_size: int = -1,
             output_statics: bool = False) -> float:
        """(reference Engine.py:302-307)"""
        tree, _, _ = self.ckpt.load(self.tree, scst=eval_scst, best=eval_best)
        self._check_multihost_ckpt(tree, (), "eval checkpoint load")
        if tree is not None:
            self.tree = tree
            self._place()
        path = {"train": self.data_cfg.train_caption_path,
                "val": self.data_cfg.val_caption_path,
                "test": self.data_cfg.test_caption_path}.get(split)
        if not path:                      # validate BEFORE decoding the split
            raise ValueError(f"unknown or unconfigured eval split {split!r}")
        self._log(f"— evaluating on {self.data_cfg.dataset_name} {split}")
        results = self.eval_captions_json_generation(split, eval_beam_size)
        if output_statics:
            return coco_eval_specific(results, path)
        return coco_eval(results, path)
