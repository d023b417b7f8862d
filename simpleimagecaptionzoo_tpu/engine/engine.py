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
from simpleimagecaptionzoo_tpu.engine.optim import make_grad_transform
from simpleimagecaptionzoo_tpu.engine.state import TrainState
from simpleimagecaptionzoo_tpu.evalcap.coco_eval import (coco_eval,
                                                         coco_eval_specific)
from simpleimagecaptionzoo_tpu.models.base import get_captioner
from simpleimagecaptionzoo_tpu.ops import cider as ops_cider
from simpleimagecaptionzoo_tpu.ops.cider import CiderDTable, RewardVocab
from simpleimagecaptionzoo_tpu.parallel import (barrier, get_mesh,
                                                host_read, place_params,
                                                processes_agree,
                                                replicate_tree, shard_batch)
from simpleimagecaptionzoo_tpu.vocab import Vocabulary


class Engine:
    """One engine per (model config, dataset).  Subclasses may override
    :meth:`show_additional_rlt` for attention visualization — the same
    extension hook as the reference (Engine.py:341, README.md:66)."""

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

    def _profile_window(self, n_exec: int, last_output) -> None:
        """`--profile_dir`: capture ONE jax.profiler trace (TensorBoard /
        xprof format) of steps 3-7 of the first training epoch that runs.
        Step 1 is the compile and step 2 its warm shadow, so the window
        holds exactly five steady-state steps; both boundaries block on
        the last dispatched step so async dispatch can't smear work across
        them.  Per-process subdirs keep multi-host runs from clobbering
        each other's event files."""
        if not self.profile_dir or self._profile_state == 2:
            return
        if self._profile_state == 0 and n_exec == 2:
            jax.block_until_ready(last_output)
            out = self.profile_dir
            if jax.process_count() > 1:
                out = os.path.join(out, f"process_{jax.process_index()}")
            jax.profiler.start_trace(out)
            self._profile_state = 1
        elif self._profile_state == 1 and n_exec >= 7:
            jax.block_until_ready(last_output)
            jax.profiler.stop_trace()
            self._profile_state = 2
            self._log(f"  profiler trace (5 steady-state steps) -> "
                      f"{self.profile_dir}")

    def _profile_close(self) -> None:
        """Close a still-open trace at epoch end (an epoch shorter than the
        step window would otherwise leak the trace into eval/next epoch and
        crash the next start_trace)."""
        if self._profile_state == 1:
            jax.profiler.stop_trace()
            self._profile_state = 2
            self._log(f"  profiler trace (short epoch) -> {self.profile_dir}")

    # ------------------------------------------------------------------ utils
    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _place(self):
        self.tree = {"params": place_params(self.mesh, self.tree["params"]),
                     "model_state": replicate_tree(self.mesh,
                                                   self.tree["model_state"])}

    def _log(self, msg: str):
        if self.verbose:
            print(msg, flush=True)

    def _monitor(self, iterable, total: int, desc: str):
        """tqdm progress bar with live loss postfix (reference
        Engine.py:171-174; toggle like --tqdm_visible, Main.py:148)."""
        if not self.tqdm_visible:
            return iterable
        try:
            import tqdm
            return tqdm.tqdm(iterable, total=total, desc=desc)
        except ImportError:
            return iterable

    @property
    def _is_writer(self) -> bool:
        """Multi-host: process 0 is the single checkpoint/metrics writer
        (all processes hold identical replicated state, so one durable copy
        is complete); writes are followed by a ``barrier`` commit point so
        no process acts on a checkpoint before it exists."""
        return jax.process_index() == 0

    def _log_metrics(self, record: dict):
        """Append a JSONL metrics record next to the checkpoints
        (observability beyond the reference's prints, SURVEY.md §5)."""
        import json
        if not self._is_writer:
            return
        with open(os.path.join(self.ckpt.root_dir, "metrics.jsonl"),
                  "a") as f:
            f.write(json.dumps(record) + "\n")

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
                             packed_dir=self.data_cfg.data_dir)

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

    def _check_multihost_ckpt(self, tree, meta: tuple, tag: str) -> None:
        """Multi-host: verify every process loaded the SAME checkpoint.

        Epoch-level checkpoints are written by process 0 only; on non-shared
        checkpoint storage the other processes would load nothing (or a stale
        file) and silently fork the replicated state — different epoch
        counters mismatch the collective schedule (hang) and different params
        psum into garbage.  Fingerprint = (found, *meta, float64 checksum of
        all numeric leaves); collective, so call on every process (uniform
        CLI args make these sites always-reached)."""
        if jax.process_count() == 1:
            return
        csum = 0.0
        if tree is not None:
            for leaf in jax.tree_util.tree_leaves(tree):
                a = np.asarray(leaf)
                if a.dtype.kind in "fiu":
                    csum += float(a.astype(np.float64).sum())
        fp = np.array([0.0 if tree is None else 1.0,
                       *[float(m) for m in meta], csum], np.float64)
        if not processes_agree(fp):
            raise RuntimeError(
                f"{tag}: processes loaded different checkpoint contents "
                f"(process {jax.process_index()}: "
                f"{'missing' if tree is None else 'found'}, meta={meta}). "
                "The checkpoint directory must be shared storage visible to "
                "every host — copy it to all hosts or point save_dir at a "
                "shared filesystem.")

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

    def _host_tree(self):
        # host_read: multi-host safe (model-axis-sharded predict-head
        # leaves are all-gathered; replicated leaves take the plain path)
        return jax.tree_util.tree_map(host_read, self.tree)

    @staticmethod
    def _epoch_rate(n_exec: int, t0: float, t_work) -> float:
        """Steps/sec excluding the first call's jit compile (``t_work`` is
        stamped after step 1's result is ready, so the window holds exactly
        ``n_exec - 1`` steps of device work).  0.0 for an empty epoch;
        full-window rate when a single step leaves nothing to exclude."""
        now = time.perf_counter()
        if n_exec == 0:
            return 0.0
        if n_exec == 1 or t_work is None:
            return n_exec / max(now - t0, 1e-9)
        return (n_exec - 1) / max(now - t_work, 1e-9)

    # ------------------------------------------- mid-epoch crash tolerance
    # The reference loses the in-flight epoch on a crash (SURVEY.md §5);
    # with --midepoch_save_steps N > 0 the loops below save a step-level
    # resume point and training(start_from='checkpoint') continues from it
    # bit-identically to an uninterrupted run (tests/test_midepoch_resume.py)
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

    # ------------------------------------------------------------------- test
    def test(self, img_filename: str, use_scst_model: bool = False,
             use_best_model: bool = True, eval_beam_size: int = -1,
             split_hint: str = "val") -> str:
        """Single-image demo (reference Engine.py:309-339): decode one image,
        print the caption, score CIDEr-D against its gts when the image is in
        the eval annotations, and hand attention maps to
        :meth:`show_additional_rlt`."""
        tree, _, _ = self.ckpt.load(self.tree, scst=use_scst_model,
                                    best=use_best_model)
        self._check_multihost_ckpt(tree, (), "test checkpoint load")
        if tree is not None:
            self.tree = tree
            self._place()
        vs = self._visual_source()
        # locate the image's annotations: try the hinted split, then the
        # others, smallest first (the reference assumes COCO val; we accept
        # any split).  Missing-split configs are skipped; corrupt jsons
        # still raise loudly.
        split_paths = {"train": self.data_cfg.train_caption_path,
                       "val": self.data_cfg.val_caption_path,
                       "test": self.data_cfg.test_caption_path}
        capdata = None
        img_id = None
        for split in dict.fromkeys([split_hint, "val", "test", "train"]):
            if not split_paths.get(split) or not os.path.exists(
                    split_paths[split]):
                continue
            cd = self._capdata(split)
            if img_filename in cd.filenameToImgid:
                capdata, img_id = cd, cd.filenameToImgid[img_filename]
                split_hint = split
                break
        entry = (capdata.imgs[img_id] if img_id is not None
                 else {"file_name": img_filename, "id": -1})
        if img_id is not None:
            self._log("ground-truth captions:")
            for ann in capdata.imgToAnns[img_id]:
                self._log("  " + ann.get("caption", ""))
        try:
            item = vs.item(entry, split_hint, False)
        except FileNotFoundError as e:
            if vs.supp is not None:
                raise FileNotFoundError(
                    f"cannot run the sample op for {self.cfg.model_type} on "
                    f"'{img_filename}': no bottom-up features for image id "
                    f"{entry['id']}"
                    + (" (image not found in any annotation split)"
                       if img_id is None else "")
                    + f" — {e}. Detection models decode from precomputed "
                    "bu features; extract them with preprocess/"
                    "generate_bottom_up_features.py, or use a Spatial/NIC "
                    "model to caption arbitrary images from pixels."
                ) from e
            raise
        visual = {k: v[None] for k, v in item.items()}
        # enrich the visualization payload (not fed to the model): original
        # image + bottom-up boxes for the Detection attention hook
        viz_item = dict(item)
        if vs.supp is not None:
            try:
                viz_item["bu_bboxes"] = vs.supp.load_bbox(entry["id"])
            except FileNotFoundError:
                pass
        if self.data_cfg.image_root:
            try:
                from PIL import Image
                from simpleimagecaptionzoo_tpu.data.datasets import image_path
                with Image.open(image_path(
                        self.data_cfg.image_root, entry["file_name"],
                        self.data_cfg.dataset_name, split_hint)) as im:
                    viz_item["original_image"] = np.asarray(im.convert("RGB"))
            except (FileNotFoundError, OSError):
                pass

        dtype = self._decode_dtype()
        key = (("greedy", "alphas") if eval_beam_size == -1
               else ("beam", eval_beam_size, "alphas"))
        if key not in self._decoders:       # cache: one compile per config
            if eval_beam_size == -1:
                self._decoders[key] = S.make_greedy_decode(
                    self.model, self.train_cfg.decode_max_len,
                    return_alphas=True, dtype=dtype)
            else:
                self._decoders[key] = S.make_beam_decode(
                    self.model, eval_beam_size,
                    self.train_cfg.beam_max_steps,
                    return_alphas=True, dtype=dtype)
        # _decode_params: same numeric path as the eval loop (int8 included)
        out = self._decoders[key](self._decode_params(),
                                  self.tree["model_state"], visual)
        ids, alphas = (out if isinstance(out, tuple) else (out, None))
        caption = self.vocab.decode_ids(np.asarray(ids)[0])
        sentence = " ".join(caption)
        self._log("Generated caption:\n" + sentence)

        if img_id is not None:
            # CIDEr-D vs this image's gts needs a precomputed idf table —
            # 'corpus' mode over one image is identically 0 (ref_len=1).
            # The reference uses CiderD(df='<ds>-val'); we use the train idf
            # built by preprocess/cider_idf_preprocess.py when present.
            from simpleimagecaptionzoo_tpu.evalcap.cider_scorer import CiderD
            from simpleimagecaptionzoo_tpu.evalcap.tokenizer import PTBTokenizer
            df_mode = f"{self.data_cfg.dataset_name}-train"
            df_path = os.path.join(self.data_cfg.data_dir, df_mode + ".p")
            if os.path.exists(df_path):
                gts = {img_id: capdata.imgToAnns[img_id]}
                res = [{"image_id": img_id, "caption": [sentence]}]
                tok_gts = PTBTokenizer(_source="gts").tokenize(gts)
                tok_res = PTBTokenizer(_source="res").tokenize(res)
                score, _ = CiderD(df=df_mode,
                                  df_dir=self.data_cfg.data_dir
                                  ).compute_score(tok_gts, tok_res)
                self._log("CIDEr-D: %.3f" % score)
            else:
                self._log("CIDEr-D skipped: idf table %s not found (run "
                          "preprocess/cider_idf_preprocess.py)" % df_path)
        self.show_additional_rlt(
            None if alphas is None else np.asarray(alphas)[0],
            viz_item, caption)
        return sentence

    def show_additional_rlt(self, alphas, visual_item: Dict, caption: List[str]):
        """Hook: attention visualization (overridden per model family,
        model_engines.py; reference BUTD_Engine.py:9-18,49-59)."""
