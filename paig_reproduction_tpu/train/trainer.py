"""The training/eval/test runtime.

Capability parity with the reference trainer ``nn/network/base.py:20-218``
(epoch loop, periodic eval + checkpoint, LR anneal, log.txt + code.zip +
outputs.npz artifacts, visualization hooks, checkpoint restore semantics
including the save_dir wipe) — re-designed around a single jitted,
donated-buffer train step running over a device mesh.

Intended-semantics divergences (documented; SURVEY.md §3.1):

* The training loss consumes the FRESH forward output — physics params and
  the velocity encoder train end-to-end. The reference optimizes against a
  stale eval-time output so only the autoencoder path gets gradients.
* LR annealing actually happens (optax schedule); the reference's is a
  no-op.
* ``visualize_sequence`` runs the model on the batch it draws; the
  reference renders outputs of the *previous* eval batch against a freshly
  drawn batch's ground truth (mismatched pairs, physics_models.py:249-259).
* example%d.jpg frames are transposed CHW->HWC; the reference reshapes
  (physics_models.py:271), which scrambles color channels into pixels.
* visualize_sequence writes min(batch_size, $PAIG_VIZ_EXAMPLES=8) example
  JPGs/GIF strips per eval; the reference writes batch_size (=100) of
  each (physics_models.py:263) — ~300 matplotlib renders per eval, which
  would dominate eval wall time. Set PAIG_VIZ_EXAMPLES=100 for parity.
* After a warm-started training run (--use_ckpt --ckpt_dir=X), the
  post-training test phase evaluates save_dir's just-trained checkpoint
  (train_model ends with an unconditional save). The reference re-loads
  X at that point (torch_run_physics.py:109 + base.py:73-77), i.e. its
  test log scores the warm start instead of the model it just trained.
  Pure --test_mode keeps the reference's ckpt_dir-priority semantics.

Metric definitions, artifact names and log formats are identical.
"""
from __future__ import annotations

import functools
import logging
import os
import shutil
import sys
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from paig_reproduction_tpu.models.physics_net import (
    PhysicsNet,
    compute_losses,
)
from paig_reproduction_tpu.parallel.distributed import (
    global_batch,
    global_index_batches,
    global_put_replicated,
)
from paig_reproduction_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    opt_state_shardings,
    param_shardings,
)
from paig_reproduction_tpu.train import optimizers as opt_lib
from paig_reproduction_tpu.train.recipes import RecipeMixin
from paig_reproduction_tpu.train.checkpoint import (
    peek_checkpoint_leaf,
    restore_checkpoint,
    save_checkpoint,
)
from paig_reproduction_tpu.utils.misc import log_metrics, zipdir
from paig_reproduction_tpu.utils.viz import gallery, gif

logger = logging.getLogger("paig")
root_path = os.path.join(os.path.dirname(os.path.realpath(__file__)),
                         "..", "..")


class Trainer(RecipeMixin):
    """Owns model params, optimizer state, the jitted step functions and
    all run artifacts. One Trainer per (model config, mesh).

    The reference-parity loop lives here; the single-command recipe
    machinery (--discovery_restarts / --aux_on_recons / --fit_physics_every
    / --auto_rescue) lives in train/recipes.RecipeMixin."""

    def __init__(self, model: PhysicsNet, mesh=None, seed: int = 0,
                 profile_dir: str = "", fused_input: bool = True,
                 native_loader: bool = False,
                 enhancers_eval_only: bool = False):
        self.model = model
        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed
        self.profile_dir = profile_dir
        # Device-resident uint8 input path with lax.scan-fused optimizer
        # steps; falls back to per-step host feeding when unavailable.
        self.fused_input = fused_input
        # C++ prefetching batcher for the host path (native/paig_data.cpp)
        self.native_loader = native_loader
        # --enhancers_eval_only: compile the TRAIN step from a clone with
        # the parameter-free inference enhancers off (init_state_fit,
        # refine_enc_pos, refine_recons_pos — their GN iterations multiply
        # train-step cost for no training benefit) while eval/test graphs
        # keep them, so a single command still scores with them.
        self.enhancers_eval_only = enhancers_eval_only
        # Steps before the extension losses activate (--aux_warmup_epochs)
        self.aux_warmup_steps = 0
        # Discovery trigger (--aux_on_recons): when > 0, the aux losses
        # stay off until the FIRST valid eval whose recons drops below
        # this value — a robust single-command staging signal where a
        # fixed epoch count is a guess (a pre-discovery model fed
        # physics-alignment losses collapses to background-only; measured
        # on runs/spring_one, benchmarks/CONVERGENCE.md).
        self.aux_on_recons = 0.0
        self._aux_triggered = False
        # Train-time physics self-identification cadence in epochs
        # (--fit_physics_every; 0 = off) and the first epoch it may run
        # (--fit_physics_after — the fit needs a discovered encoder).
        self.fit_physics_every = 0
        self.fit_physics_after = 0
        # In-training slot-rescue surgery (--auto_rescue): if a valid
        # eval at epoch >= auto_rescue still has recons above
        # rescue_recons, discovery has stalled in the measured dead-slot
        # attractor (benchmarks/CONVERGENCE.md) — apply the rescue that
        # cracked mnist/3bp (train/surgery.py) in-place and continue:
        # reset dead (or least-healthy / all-ballooned) slots to disk
        # priors, pin the background to the pixelwise train median,
        # freeze it (bg_lr_mult=0) and re-init the optimizer state.
        # Fires at most max_rescues times (--max_rescues, default 1 =
        # one-shot), with auto_rescue epochs of cooldown between firings;
        # persisted in the checkpoint as rescue_step/rescue_count.
        self.auto_rescue = 0
        self.rescue_recons = 3.0
        self.rescue_disk_radius = 0.0
        self.rescue_seed_color = False
        self.max_rescues = 1
        self._rescue_count = 0
        self._last_rescue_ep = -(10 ** 9)
        self._rescue_step = -1
        # (epoch, valid recons) per eval — the rescue's stall guard
        # compares against the eval ~auto_rescue/2 epochs back so a
        # still-DESCENDING run (late discovery in progress) is never
        # reset just for being above the threshold at the deadline.
        self._recons_history = []
        # Epoch the checkpoint writer stamps (current position of
        # train_model's epoch loop; persists the stall-guard frame).
        self._cur_epoch = 0
        # Epochs already consumed before train_model's loop (the
        # --discovery_restarts phase); the rescue's remaining-horizon LR
        # schedule rebuild must subtract them.
        self._epochs_consumed = 0
        # --watchdog_secs: heartbeat timeout for hung accelerator RPCs
        # (0 = off). Created lazily on the first _wd_pet so short/test
        # uses never spawn the thread (train/watchdog.py).
        self.watchdog_secs = 0.0
        self._watchdog = None
        # Cumulative epochs finished by the checkpoint chain this run
        # resumed (0 for a fresh run); lets --resume_remaining_epochs
        # finish the original schedule across repeated crash-resumes.
        self._epoch_base = 0
        self.params = None
        self.opt_state = None
        self.step = 0
        self.tx = None
        self._train_step = None
        self._eval_step = None
        self.train_metrics: Dict[str, Any] = {}
        self.eval_metrics: Dict[str, Any] = {}
        self.extra_train_fns = []
        self.extra_valid_fns = [(self.visualize_sequence, [], {})]
        self.extra_test_fns = [(self.visualize_sequence, [], {})]

    # ----- data ------------------------------------------------------------
    def get_data(self, data_iterators):
        (self.train_iterator, self.valid_iterator,
         self.test_iterator) = data_iterators

    def get_iterator(self, type):
        return {"train": self.train_iterator,
                "valid": self.valid_iterator,
                "test": self.test_iterator}[type]

    def get_batch(self, batch_size, iterator):
        batch_x, batch_y = iterator.next_batch(batch_size)
        feed_dict = {"input": batch_x}
        if batch_y is not None:
            feed_dict["target"] = batch_y
        return feed_dict, (batch_x, batch_y)

    # ----- setup -----------------------------------------------------------
    def init_params(self, sample_batch: np.ndarray):
        rng = jax.random.PRNGKey(self.seed)
        # Kept for --discovery_restarts re-initialization.
        self._init_batch = np.asarray(sample_batch[:1])
        variables = self.model.init(rng, jnp.asarray(self._init_batch))
        self.params = variables["params"]

    def build_optimizer(self, base_lr, optimizer="rmsprop", anneal_lr=True,
                        epochs: int = 0, steps_per_epoch: int = 1,
                        physics_lr_mult: float = 1.0,
                        grad_clip: float = 0.0,
                        aux_warmup_epochs: int = 0,
                        bg_lr_mult: float = 1.0):
        """Mirrors reference build_optimizer (physics_models.py:144-149) +
        the working anneal schedule."""
        self.base_lr = base_lr
        self.anneal_lr = anneal_lr
        schedule = opt_lib.lr_schedule(base_lr, epochs, steps_per_epoch,
                                       anneal_lr)
        assert self.params is not None, "init_params before build_optimizer"
        self.aux_warmup_steps = aux_warmup_epochs * steps_per_epoch
        # Kept for mid-run optimizer rebuilds (--auto_rescue freezes the
        # background by rebuilding with bg_lr_mult=0).
        self._opt_args = dict(optimizer=optimizer, epochs=epochs,
                              steps_per_epoch=steps_per_epoch,
                              physics_lr_mult=physics_lr_mult,
                              grad_clip=grad_clip)
        self.tx = opt_lib.build_optimizer(optimizer, schedule, self.params,
                                          physics_lr_mult=physics_lr_mult,
                                          grad_clip=grad_clip,
                                          bg_lr_mult=bg_lr_mult)
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self._compile_steps()

    def _compile_steps(self, preserve_data: bool = False):
        model, tx = self.model, self.tx
        b_shard = batch_sharding(self.mesh)
        p_shard = param_shardings(self.params, self.mesh)
        self._batch_sharding = b_shard
        # Kept for --discovery_restarts: arm re-inits must be placed
        # under the same shardings or the jitted steps recompile (and
        # tensor-sharded runs would silently train unsharded arms).
        self._param_shardings = p_shard

        # Place params/opt state according to the mesh rules once; optimizer
        # moments shard consistently with their (possibly tensor-sharded)
        # params. Leaf-wise global_put_replicated: on multi-process runs a
        # plain device_put cannot target non-addressable devices, and the
        # leaves may be host numpy (fresh init, post---auto_rescue surgery).
        self.params = jax.tree.map(global_put_replicated, self.params,
                                   p_shard)
        o_shard = opt_state_shardings(self.opt_state, self.mesh)
        self.opt_state = jax.tree.map(global_put_replicated, self.opt_state,
                                      o_shard)

        def make_loss_fn(m):
            def loss_fn(params, batch, aux_scale=1.0):
                out, aux = m.apply({"params": params}, batch)
                train_loss, eval_losses = compute_losses(
                    m, batch, out, aux["recons_out"],
                    aux.get("center_penalty"),
                    aux.get("vel_anchor_penalty"),
                    aux.get("coarse_pred_loss"),
                    aux.get("pos_consistency_loss"),
                    aux.get("attn_overlap_penalty"),
                    aux_scale=aux_scale)
                return train_loss, eval_losses
            return loss_fn

        # Eval/test graphs always honor the full model config; with
        # --enhancers_eval_only the TRAIN graphs drop the parameter-free
        # inference enhancers (same params, same losses otherwise — their
        # GN iterations multiply train-step cost).
        loss_fn = make_loss_fn(model)
        train_loss_fn = (
            make_loss_fn(model.clone(init_state_fit=0, refine_enc_pos=0,
                                     refine_recons_pos=0))
            if self.enhancers_eval_only
            and (model.init_state_fit > 0 or model.refine_enc_pos > 0
                 or model.refine_recons_pos > 0)
            else loss_fn)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, batch, step, warmup):
            # `warmup` is a traced argument (not a closure constant) so
            # the host can move the aux-activation boundary mid-run
            # (--aux_on_recons discovery trigger) without a recompile.
            scale = (step >= warmup).astype(jnp.float32)
            (loss, eval_losses), grads = jax.value_and_grad(
                train_loss_fn, has_aux=True)(params, batch, scale)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            metrics = dict(eval_losses, train_loss=loss)
            return params, opt_state, metrics

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_chunk(params, opt_state, data_u8, idxs, step0, warmup):
            """K fused optimizer steps in one dispatch (lax.scan).

            data_u8: the whole train split resident in HBM as uint8
            [N, T, C, H, W]; idxs: [K, B] int32. Batch gather + /255
            normalization happen in-graph, so only the tiny index matrix
            crosses host->device per chunk. This removes the per-step
            dispatch latency that dominates this small model's step time
            (new capability; the reference feeds one host batch per step,
            base.py:139-141).
            """

            def body(carry, xs):
                p, o = carry
                idx, step = xs
                scale = (step >= warmup).astype(jnp.float32)
                batch = data_u8[idx].astype(jnp.float32) / 255.0
                (loss, eval_losses), grads = jax.value_and_grad(
                    train_loss_fn, has_aux=True)(p, batch, scale)
                updates, o = tx.update(grads, o, p)
                p = jax.tree.map(lambda x, u: x + u, p, updates)
                return (p, o), dict(eval_losses, train_loss=loss)

            steps = step0 + jnp.arange(idxs.shape[0], dtype=jnp.int32)
            (params, opt_state), metrics = jax.lax.scan(
                body, (params, opt_state), (idxs, steps))
            return params, opt_state, metrics

        @jax.jit
        def eval_step(params, batch):
            loss, eval_losses = loss_fn(params, batch)
            return dict(eval_losses, train_loss=loss)

        @jax.jit
        def eval_chunk(params, data_u8, idxs):
            """Whole-eval-epoch metrics in ONE dispatch: scan over [K, B]
            index batches gathered from the device-resident uint8 split
            (same trick as train_chunk — only the index matrix crosses
            host->device; the reference feeds one host batch per eval
            step, base.py:190-199)."""

            def body(_, idx):
                batch = data_u8[idx].astype(jnp.float32) / 255.0
                loss, eval_losses = loss_fn(params, batch)
                return None, dict(eval_losses, train_loss=loss)

            _, metrics = jax.lax.scan(body, None, idxs)
            return metrics

        @jax.jit
        def forward(params, batch):
            return model.apply({"params": params}, batch)

        def forward_extras(params, batch):
            return model.apply({"params": params}, batch, with_extras=True)

        def with_mesh(fn):
            """Run fn under this trainer's mesh context so the model's
            internal with_sharding_constraint calls
            (physics_net._replicate_if_mesh) resolve against it at trace
            time — TP runs then avoid GSPMD's replicate-then-partition
            fallback in the rollout scan. A scoped context (not the
            jax.set_mesh global): trainers with different meshes, and
            mesh-free code in the same process, stay unaffected."""
            def wrapped(*args, **kwargs):
                with jax.sharding.set_mesh(self.mesh):
                    return fn(*args, **kwargs)
            return wrapped

        self._train_step = with_mesh(train_step)
        self._train_chunk = with_mesh(train_chunk)
        self._eval_step = with_mesh(eval_step)
        self._eval_chunk = with_mesh(eval_chunk)
        self._forward = with_mesh(forward)
        self._forward_extras = with_mesh(jax.jit(forward_extras))
        if preserve_data:
            # Mid-run rebuild (--auto_rescue): the mesh is unchanged, so
            # the device-resident uint8 splits stay valid, and an
            # in-flight outputs.npz writer keeps its handle.
            return
        # An in-flight npz writer must not be orphaned: a later eval
        # would see _npz_thread None, skip the join, and race a second
        # writer onto the same outputs.npz path.
        if getattr(self, "_npz_thread", None) is not None:
            self._npz_thread.join()
        self._train_u8 = None   # device-resident train split (lazy)
        self._eval_u8 = {}      # device-resident eval splits (lazy)
        self._npz_thread = None

    # ----- checkpoint / save_dir semantics ----------------------------------
    def initialize_graph(self, save_dir, use_ckpt, ckpt_dir=""):
        """Reference save_dir semantics (base.py:65-94): a fresh run WIPES
        an existing save_dir; --use_ckpt restores from ckpt_dir or
        save_dir."""
        self.save_dir = save_dir
        restore, restore_dir = False, save_dir
        if os.path.exists(save_dir):
            if use_ckpt:
                restore = True
                restore_dir = ckpt_dir if ckpt_dir else save_dir
            else:
                logger.info("Folder exists, deleting...")
                shutil.rmtree(save_dir)
                os.makedirs(save_dir)
        else:
            os.makedirs(save_dir)
            if use_ckpt:
                restore = True
                restore_dir = ckpt_dir

        if restore:
            print(f"Loading model from: {restore_dir}/model.ckpt")
            target = {"params": self.params, "opt_state": self.opt_state,
                      "step": jnp.asarray(self.step),
                      # -1 = trigger not fired (also the value partial
                      # restore keeps for pre-trigger-era checkpoints)
                      "aux_trigger_step": jnp.asarray(-1),
                      "rescue_step": jnp.asarray(-1),
                      "rescue_count": jnp.asarray(-1),
                      "epoch": jnp.asarray(0),
                      "total_epochs_done": jnp.asarray(0),
                      "rescue_epoch": jnp.asarray(-(10 ** 9))}
            restored = restore_checkpoint(restore_dir, target)
            self.params = restored["params"]
            self.opt_state = restored["opt_state"]
            self.step = int(restored["step"])
            # Epoch the checkpoint was written at, in the SAVING run's
            # numbering (0 for pre-round-5 checkpoints). The resumed
            # run's epoch loop restarts at 1, so every persisted epoch
            # quantity below is rebased by -ep_saved into the resumed
            # frame (rescue at saved-epoch 450 of an 800-epoch run
            # becomes -350: its cooldown is long spent).
            ep_saved = int(restored["epoch"])
            # Cumulative schedule position across a chain of resumes
            # (pre-extension checkpoints carry only the run-local epoch;
            # for an unresumed saver the two are equal).
            self._epoch_base = max(int(restored["total_epochs_done"]),
                                   ep_saved)
            hist = peek_checkpoint_leaf(restore_dir, "recons_history")
            if hist is not None and np.size(hist):
                self._recons_history = [
                    (int(e) - ep_saved, float(r))
                    for e, r in np.asarray(hist)]
                logger.info(
                    "auto_rescue stall-guard history restored (%d evals, "
                    "rebased to resume epoch 0)",
                    len(self._recons_history))
            resc = int(restored["rescue_step"])
            if resc >= 0:
                # The checkpoint was produced after an --auto_rescue
                # surgery: restore the rescue budget (pre-rescue_count
                # checkpoints carry -1 -> count as one surgery), and
                # remind the user that the frozen-background phase is not
                # restored automatically (the post-rescue polish is
                # usually run all-trainable — the mnist winner
                # runs/mnist_polish1 — but a resumed frozen phase needs
                # the flag back).
                rc = int(restored["rescue_count"])
                self._rescue_count = rc if rc >= 0 else 1
                self._rescue_step = resc
                resc_ep = int(restored["rescue_epoch"])
                if resc_ep > -(10 ** 8):
                    self._last_rescue_ep = resc_ep - ep_saved
                else:
                    # Pre-round-5 checkpoint without the surgery epoch:
                    # enforce the cooldown conservatively from the resume
                    # point (a resumed run waits a full auto_rescue
                    # window before a further rescue may fire).
                    self._last_rescue_ep = 0
                logger.info(
                    "auto_rescue state restored (surgery at step %d, "
                    "%d rescue(s) used); pass --bg_lr_mult=0 to keep the "
                    "background frozen on this resume", resc,
                    self._rescue_count)
            trig = int(restored["aux_trigger_step"])
            if self.aux_on_recons > 0 and trig >= 0:
                # Resumed run had already passed the --aux_on_recons
                # discovery gate: keep the aux losses on from step 0
                # instead of silently re-disarming until the next eval.
                self._aux_triggered = True
                self.aux_warmup_steps = trig
                logger.info(
                    "aux_on_recons trigger restored from checkpoint "
                    "(fired at step %d)", trig)

    def save(self):
        save_checkpoint(self.save_dir, {
            "params": self.params, "opt_state": self.opt_state,
            "step": jnp.asarray(self.step),
            "aux_trigger_step": jnp.asarray(
                self.aux_warmup_steps if self._aux_triggered else -1),
            "rescue_step": jnp.asarray(self._rescue_step),
            "rescue_count": jnp.asarray(self._rescue_count),
            # Stall-guard context (VERDICT r4 §7): the epoch this
            # checkpoint was written at, the epoch of the last surgery,
            # and the recent (epoch, valid recons) eval history — all in
            # this run's epoch numbering; restore rebases them to the
            # resumed run's frame so a kill/resume keeps its cooldown and
            # descent baseline instead of the conservative blind mode.
            "epoch": jnp.asarray(self._cur_epoch),
            "total_epochs_done": jnp.asarray(
                self._epoch_base + self._cur_epoch),
            "rescue_epoch": jnp.asarray(self._last_rescue_ep),
            # Orbax refuses zero-size arrays, so the leaf is present only
            # once an eval has run (restore treats absence as no history).
            **({"recons_history": np.asarray(
                self._recons_history[-64:], np.float32).reshape(-1, 2)}
               if self._recons_history else {})})

    # ----- logging ----------------------------------------------------------
    def add_train_logger(self):
        log_path = os.path.abspath(os.path.join(self.save_dir, "log.txt"))
        # Idempotent per file: run_discovery_restarts + train_model (and
        # the train + test phases of one CLI run, which share the module
        # logger) each attach — a second handler on the same file would
        # double every line.
        for h in logger.handlers:
            if getattr(h, "baseFilename", None) == log_path:
                return
        fh = logging.FileHandler(log_path)
        fh.setFormatter(
            logging.Formatter("%(asctime)s - %(name)s - %(message)s"))
        logger.addHandler(fh)

    def _log_train_metrics(self, metrics, step):
        self.train_metrics = {"train_loss": metrics["train_loss"]}
        self.eval_metrics = {
            k: metrics[k] for k in ("eval_pred_loss", "eval_extrap_loss",
                                    "eval_recons_loss")}
        log_metrics(logger, "train - iter=%s" % step, self.train_metrics)

    def run_extra_fns(self, type):
        fns = {"train": self.extra_train_fns,
               "valid": self.extra_valid_fns}.get(type, self.extra_test_fns)
        for fn, args, kwargs in fns:
            fn(*args, **kwargs)

    # ----- core loops --------------------------------------------------------
    def _put_batch(self, batch_np):
        batch = np.asarray(batch_np)
        n_data = self.mesh.shape["data"]
        if batch.shape[0] % n_data:
            # Odd-sized batches (tiny viz/eval sets) can't shard over the
            # data axis — replicate instead of failing.
            return global_batch(batch, jax.sharding.NamedSharding(
                self.mesh, jax.sharding.PartitionSpec()))
        return global_batch(batch, self._batch_sharding)

    def _put_batch_replicated(self, batch_np):
        """Fully-replicated batch upload, for host-fetching hooks (the
        recipe fit/offset estimators read jit outputs back with
        np.asarray, which cannot read arrays sharded across processes)."""
        return global_batch(np.asarray(batch_np), jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec()))

    def _chunk_len(self, print_interval=0):
        """Fused-chunk length (steps per dispatch). Independent of the
        logging cadence (per-step metrics for every step of a chunk come
        back in one array regardless); PAIG_CHUNK_STEPS overrides.

        On accelerators the default covers a whole reference-size epoch
        (50 steps at B=100 over 5000 examples): next_index_batches stops
        at the epoch boundary regardless, so a large cap is semantics-
        preserving and cuts the per-dispatch host work (index device_put,
        metric fetch — each a tunnel round-trip) to once per epoch
        (VERDICT r4 §6, the e2e-vs-fused gap)."""
        chunk_env = int(os.environ.get("PAIG_CHUNK_STEPS", "0"))
        if chunk_env > 0:
            return chunk_env
        base = 25 if jax.default_backend() == "cpu" else 128
        return max(base, print_interval)

    def _dispatch_fused_chunk(self, batch_size, chunk_k, warmup):
        """One fused-chunk dispatch: draw up to chunk_k index batches
        from the train iterator, gather+step on device, advance
        self.step. Returns (n_done, device metrics dict). Shared by
        train_model and the --discovery_restarts arms so chunk dispatch
        semantics cannot drift between them."""
        self._ensure_train_u8()
        idxs = self.train_iterator.next_index_batches(
            batch_size, chunk_k).astype(np.int32)
        idxs_d = global_index_batches(idxs, self._idx_sharding())
        step0 = self.step
        self.params, self.opt_state, metrics = self._train_chunk(
            self.params, self.opt_state, self._train_u8, idxs_d,
            jnp.asarray(step0, jnp.int32), warmup)
        self.step = step0 + idxs.shape[0]
        return idxs.shape[0], metrics

    def _fused_train_enabled(self, batch_size):
        # Fused whole-chunk dispatch exists to amortize the accelerator
        # tunnel's per-dispatch latency. On the CPU backend the chunked
        # TRAIN executable is pathologically slow (measured 2026-08-18 on
        # spring_color B=100: >470 s for a K=1 chunk vs ~5 s for the
        # plain per-step jit — XLA:CPU handles the fwd+bwd scan body far
        # worse than the same body as a top-level computation), so
        # default to per-step dispatch there. PAIG_FUSED=1/0 overrides
        # either way (tests pin =1 to keep the fused path covered on the
        # emulated CPU mesh, where tiny shapes stay fast).
        fused_env = os.environ.get("PAIG_FUSED")
        fused_backend = (fused_env == "1" if fused_env is not None
                         else jax.default_backend() != "cpu")
        return (self.fused_input and fused_backend
                and getattr(self.train_iterator, "raw_uint8", None)
                is not None
                and self.train_iterator.num_examples >= batch_size
                and batch_size % self.mesh.shape["data"] == 0)

    def _ensure_train_u8(self):
        # Upload the whole train split once, as uint8 (4x smaller
        # than f32), replicated across the mesh (multi-host safe).
        # Lazy + re-entrant: a mid-run optimizer rebuild
        # (--auto_rescue) recompiles the step functions and drops the
        # device-resident split; the next chunk re-uploads it.
        if self._train_u8 is None:
            self._train_u8 = global_batch(
                self.train_iterator.raw_uint8,
                jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec()))

    def _idx_sharding(self):
        # [K, B] index matrix shards over batch on every topology; on
        # multi-host runs each process uploads its own column block
        # (global_index_batches) so the fused chunk actually
        # data-parallelizes — a replicated index matrix made every
        # device gather and compute the FULL batch (round-3 behavior).
        return jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(None, "data"))

    def _fused_eval_enabled(self, it, batch_size):
        """One predicate for the fused (device-resident, whole-epoch)
        eval path, shared by eval_performance and the restart-arm
        scorer so eligibility can't drift between them."""
        raw = getattr(it, "raw_uint8", None)
        n = it.X.shape[0]
        return (self.fused_input and raw is not None and n >= batch_size
                and batch_size % self.mesh.shape["data"] == 0)

    def _ensure_eval_u8(self, type, raw):
        if type not in self._eval_u8:
            self._eval_u8[type] = global_batch(
                raw, jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec()))

    def _wd_pet(self):
        """Heartbeat for the hung-RPC watchdog (--watchdog_secs). Called
        once per dispatched batch/chunk by every train/eval loop; the
        first call arms the monitor thread."""
        wd = self._watchdog
        if wd is None:
            if self.watchdog_secs <= 0:
                return
            from paig_reproduction_tpu.train.watchdog import DeviceWatchdog
            wd = self._watchdog = DeviceWatchdog(
                self.watchdog_secs,
                adaptive_floor_secs=getattr(self, "watchdog_floor_secs", 0.0))
            wd.start()
        wd.pet()

    def train_model(self, epochs, batch_size, save_every_n_epochs,
                    eval_every_n_epochs, print_interval, debug=False):
        """Reference train loop semantics (base.py:112-172): pre-train
        eval, per-epoch batch loop keyed on the iterator's epoch counter,
        periodic eval/save, final test eval."""
        self.batch_size = batch_size
        self.add_train_logger()
        zipdir(root_path, self.save_dir)
        logger.info("\n".join(sys.argv))

        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)

        if not debug and epochs > 0:
            valid_metrics_results = self.eval_performance(
                batch_size, type="valid")
            log_metrics(logger, "valid - epoch=%s" % 0,
                        valid_metrics_results)
            self._recons_history.append(
                (0, float(valid_metrics_results["eval_recons_loss"])))

        use_fused = self._fused_train_enabled(batch_size)
        ensure_train_u8 = self._ensure_train_u8
        if use_fused:
            ensure_train_u8()

        native = None
        raw = getattr(self.train_iterator, "raw_uint8", None)
        if (self.native_loader and not use_fused and raw is not None
                and batch_size <= raw.shape[0]):
            from paig_reproduction_tpu.data.native import (
                NativeBatcher,
                NativeLoaderUnavailable,
            )
            try:
                native = NativeBatcher(raw, batch_size, seed=self.seed)
                logger.info("using native C++ prefetching loader")
            except NativeLoaderUnavailable as e:
                logger.info("native loader unavailable (%s); "
                            "falling back to python iterator", e)

        step = self.step
        t0 = time.perf_counter()
        frames = 0
        # A user with --print_interval=1 must NOT silently fall back to
        # per-step dispatch (_chunk_len handles it).
        chunk_k = self._chunk_len(print_interval)

        # Deferred metric logging: per-chunk metrics stay ON DEVICE and
        # accumulate; the device->host fetch happens only at epochs that
        # actually consume them (eval/save/fit boundaries, every few
        # chunks, and at loop end). Each fetch is a tunnel round-trip
        # (~10-30 ms through axon), so fetching once per chunk put a
        # fixed ~25% tax on short epochs (VERDICT r4 §6). log.txt still
        # gets a train line for every print_interval step, in order.
        pending_metrics = []

        def drain_pending(keep_last=False):
            # keep_last: leave the most recent (likely still in-flight)
            # chunk pending so the fetch never serializes with it.
            nonlocal pending_metrics
            tail = [pending_metrics.pop()] if (keep_last
                                               and pending_metrics) else []
            todo = [entry for entry in pending_metrics
                    if any((entry[1] + i) % print_interval == 0
                           for i in range(entry[2]))]
            if todo:
                # One transfer for every pending chunk (device_get takes
                # a pytree): a drain of D chunks costs one tunnel
                # round-trip, not D.
                fetched = jax.device_get([m for m, _, _ in todo])
                for host, (_, step0, n_done) in zip(fetched, todo):
                    for i in range(n_done):
                        if (step0 + i) % print_interval == 0:
                            m = {kk: float(v[i])
                                 for kk, v in host.items()}
                            self._log_train_metrics(m, step0 + i)
            pending_metrics = tail

        for ep in range(1, epochs + 1):
            self._cur_epoch = ep
            while (native.epochs_completed if native is not None
                   else self.train_iterator.epochs_completed) < ep:
                self._wd_pet()
                if native is not None:
                    batch = self._put_batch(native.next_batch_x())
                    self.params, self.opt_state, metrics = \
                        self._train_step(self.params, self.opt_state,
                                         batch,
                                         jnp.asarray(step, jnp.int32),
                                         jnp.asarray(self.aux_warmup_steps,
                                                     jnp.int32))
                    frames += batch.shape[0] * batch.shape[1]
                    self.run_extra_fns("train")
                    if step % print_interval == 0:
                        self._log_train_metrics(
                            {k: float(v) for k, v in metrics.items()},
                            step)
                    step += 1
                    self.step = step
                    continue
                if use_fused:
                    n_done, metrics = self._dispatch_fused_chunk(
                        batch_size, chunk_k,
                        jnp.asarray(self.aux_warmup_steps, jnp.int32))
                    frames += n_done * batch_size * self.model.seq_len
                    self.run_extra_fns("train")
                    pending_metrics.append((metrics, step, n_done))
                    # fetch/log OLDER chunks while this one executes;
                    # bounded so a long no-eval stretch can't pile up
                    # unbounded device-resident metric arrays
                    if len(pending_metrics) > 8:
                        drain_pending(keep_last=True)
                    step += n_done
                    self.step = step
                    continue

                feed_dict, _ = self.get_batch(batch_size,
                                              self.train_iterator)
                batch = self._put_batch(feed_dict["input"])
                self.params, self.opt_state, metrics = self._train_step(
                    self.params, self.opt_state, batch,
                    jnp.asarray(step, jnp.int32),
                    jnp.asarray(self.aux_warmup_steps, jnp.int32))
                frames += batch.shape[0] * batch.shape[1]

                self.run_extra_fns("train")

                if step % print_interval == 0:
                    metrics = {k: float(v) for k, v in metrics.items()}
                    self._log_train_metrics(metrics, step)
                step += 1
                self.step = step

            # Drain only at epochs that consume the metrics (train lines
            # must precede the epoch's eval/fit lines in log.txt); on
            # plain epochs the pending fetches ride along with later
            # chunks instead of costing a round-trip each.
            if (ep % eval_every_n_epochs == 0
                    or ep % save_every_n_epochs == 0
                    or (self.fit_physics_every > 0
                        and ep % self.fit_physics_every == 0)):
                drain_pending()

            if (self.fit_physics_every > 0
                    and ep >= self.fit_physics_after
                    and (self.aux_on_recons <= 0 or self._aux_triggered)
                    and ep % self.fit_physics_every == 0):
                self._identify_physics(batch_size)

            if ep % eval_every_n_epochs == 0:
                print("eval running")
                valid_metrics_results = self.eval_performance(
                    batch_size, type="valid")
                log_metrics(logger, "valid - epoch=%s" % ep,
                            valid_metrics_results)
                cur_recons = float(
                    valid_metrics_results["eval_recons_loss"])
                self._recons_history.append((ep, cur_recons))
                rescued_now = False
                if (self.auto_rescue > 0
                        and self._rescue_count < self.max_rescues
                        and ep >= self.auto_rescue
                        and ep - self._last_rescue_ep >= self.auto_rescue
                        and cur_recons > self.rescue_recons
                        and self._discovery_stalled(ep, cur_recons)):
                    self._do_auto_rescue(ep, cur_recons)
                    rescued_now = True
                # The aux trigger must not read the PRE-surgery recons in
                # the eval that just fired a rescue: the reset model's
                # recons is far above threshold again, and arming the
                # alignment losses on it is the documented collapse mode.
                if (not rescued_now
                        and self.aux_on_recons > 0 and not self._aux_triggered
                        and float(valid_metrics_results
                                  ["eval_recons_loss"])
                        < self.aux_on_recons):
                    self._aux_triggered = True
                    if self.fit_physics_every > 0:
                        # Physics is still uninitialized here; arming the
                        # alignment losses now would anchor the encoder
                        # to garbage rollouts (measured collapse:
                        # runs/spring_one2, recons 1.25 -> 20). The first
                        # ACCEPTED train-time fit enables them instead.
                        logger.info(
                            "aux_on_recons trigger: valid recons %.3f < "
                            "%.3f at epoch %d (step %d) — train-time "
                            "physics fits armed; alignment losses enable "
                            "on the first accepted fit",
                            float(valid_metrics_results
                                  ["eval_recons_loss"]),
                            self.aux_on_recons, ep, step)
                    else:
                        self.aux_warmup_steps = step
                        logger.info(
                            "aux_on_recons trigger: valid recons %.3f < "
                            "%.3f at epoch %d (step %d) — physics-"
                            "alignment losses now active",
                            float(valid_metrics_results
                                  ["eval_recons_loss"]),
                            self.aux_on_recons, ep, step)

            if ep % save_every_n_epochs == 0:
                print("saving")
                self.save()

        drain_pending()   # every earned train line lands before test's

        if epochs > 0:
            # Host-fetch sync for the throughput clock (block_until_ready
            # alone can return early through the axon tunnel;
            # benchmarks/MFU_AUDIT.md §2).
            np.asarray(jax.tree.leaves(self.params)[0]).ravel()[:1]
            dt = time.perf_counter() - t0
            # Unconditional final save AFTER the clock: the post-training
            # test phase (and any later --test_mode run) evaluates
            # save_dir's checkpoint, which must be the finished model even
            # when `epochs` is not a multiple of save_every_n_epochs —
            # but a checkpoint write is not epoch-loop work.
            self.save()
            # End-to-end epoch-loop throughput (host index prep, logging,
            # dispatch, any interleaved evals) — read by bench.py.
            self.last_train_fps = frames / dt
            logger.info("throughput: %.1f video frames/sec (%d frames, "
                        "%.1fs incl. eval)", frames / dt, frames, dt)
        if self.profile_dir:
            jax.profiler.stop_trace()

        test_metrics_results = self.eval_performance(batch_size,
                                                     type="test")
        log_metrics(logger, "test - epoch=%s" % epochs,
                    test_metrics_results)
        self.flush_artifacts()
        return test_metrics_results

    def flush_artifacts(self):
        """Block until the async outputs.npz writer (if any) finishes."""
        if self._npz_thread is not None:
            self._npz_thread.join()
            self._npz_thread = None

    def eval_performance(self, batch_size, type="valid"):
        """Reference eval loop (base.py:174-218): whole-epoch metric
        averaging, batch shrink for small datasets, outputs.npz dump, then
        the visualization hooks.

        Fast path: the eval split lives in HBM as uint8 and the whole
        epoch's metrics come back in one fused dispatch; the (compressed)
        outputs.npz dump happens on a writer thread off the eval path."""
        keys = ("eval_pred_loss", "eval_extrap_loss", "eval_recons_loss")
        eval_iterator = self.get_iterator(type)
        eval_iterator.reset_epoch()
        n = eval_iterator.X.shape[0]
        if n < 100:
            batch_size = n

        raw = getattr(eval_iterator, "raw_uint8", None)
        use_fused = self._fused_eval_enabled(eval_iterator, batch_size)
        if use_fused:
            self._wd_pet()
            self._ensure_eval_u8(type, raw)
            # All index batches of one epoch (the iterator drops the
            # ragged tail, matching reference epoch semantics).
            idxs = eval_iterator.next_index_batches(
                batch_size, 10 ** 9).astype(np.int32)
            metrics = self._eval_chunk(
                self.params, self._eval_u8[type],
                global_index_batches(idxs, self._idx_sharding()))
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            eval_metrics_results = {k: metrics[k].mean() for k in keys}
            inputs = eval_iterator.X[idxs.reshape(-1)]
            outputs = np.stack([metrics[k] for k in keys], axis=1)
        else:
            per_batch = {k: [] for k in keys}
            input_parts = []
            while eval_iterator.get_epoch() < 1:
                self._wd_pet()
                feed_dict, _ = self.get_batch(batch_size, eval_iterator)
                batch = self._put_batch(feed_dict["input"])
                m = self._eval_step(self.params, batch)
                m = {k: np.asarray(v) for k, v in m.items()}
                for k in keys:
                    per_batch[k].append(m[k])
                input_parts.append(feed_dict["input"])
            eval_metrics_results = {
                k: np.mean(np.asarray(v), axis=0)
                for k, v in per_batch.items()}
            inputs = np.concatenate(input_parts, axis=0)
            outputs = np.array([[per_batch[k][i] for k in keys]
                                for i in range(len(input_parts))])

        self._write_outputs_npz(inputs, outputs)
        self.run_extra_fns(type)
        return eval_metrics_results

    def _write_outputs_npz(self, inputs, outputs):
        """Write outputs.npz (reference artifact, base.py:212-214) on a
        non-daemon writer thread: zlib-compressing the ~70MB input dump
        dominates eval wall time otherwise (single-CPU host). Joins any
        previous writer first so writes never interleave. Level-1 deflate
        via utils.npz.savez_fast — same npz container, ~6x cheaper."""
        import threading

        from paig_reproduction_tpu.utils.npz import savez_fast

        if self._npz_thread is not None:
            self._npz_thread.join()
        path = os.path.join(self.save_dir, "outputs.npz")

        def write():
            savez_fast(path, input=inputs, output=outputs)

        self._npz_thread = threading.Thread(target=write, daemon=False)
        self._npz_thread.start()

    # ----- visualization ------------------------------------------------------
    def visualize_sequence(self):
        """Artifact parity with reference visualize_sequence
        (physics_models.py:247-330): example%d.jpg (rows: prediction /
        ground truth / reconstruction), animation%d.gif, templates.jpg,
        extra_outputs.npz."""
        import matplotlib
        matplotlib.use("agg")
        import matplotlib.cm as cm
        import matplotlib.pyplot as plt

        model = self.model
        batch_size = min(getattr(self, "batch_size", 8),
                         int(os.environ.get("PAIG_VIZ_EXAMPLES", "8")))
        feed_dict, (batch_x, _) = self.get_batch(batch_size,
                                                 self.test_iterator)
        batch_x = batch_x[:batch_size]
        batch = self._put_batch(batch_x)
        output, aux = self._forward_extras(self.params, batch)
        output_seq = np.asarray(output)
        recons_seq = np.asarray(aux["recons_out"])
        pos_vel_seq = np.asarray(aux["pos_vel_seq"])
        extras = jax.tree.map(np.asarray, aux["extras"])

        for i in range(min(2, batch_size)):
            logger.info(pos_vel_seq[i])

        output_seq = np.concatenate(
            [batch_x[:, :model.input_steps], output_seq], axis=1)
        recons_seq = np.concatenate(
            [recons_seq,
             np.zeros((batch_size, model.extrap_steps)
                      + recons_seq.shape[2:])], axis=1)

        h = w = model.img_size
        ch = model.conv_ch
        norm = plt.Normalize(0.0, 1.0)
        figsize = None
        for i in range(batch_x.shape[0]):
            to_concat = [output_seq[i], batch_x[i], recons_seq[i]]
            total_seq = np.concatenate(to_concat, axis=0)   # [3T, C, H, W]
            total_seq = np.transpose(total_seq, (0, 2, 3, 1))
            result = gallery(total_seq, ncols=batch_x.shape[1])
            figsize = (result.shape[1] // h, result.shape[0] // w)
            fig, ax = plt.subplots(figsize=figsize)
            ax.imshow(np.squeeze(result), interpolation="nearest",
                      cmap=cm.Greys_r, norm=norm)
            ax.get_xaxis().set_visible(False)
            ax.get_yaxis().set_visible(False)
            fig.tight_layout()
            fig.savefig(os.path.join(self.save_dir, "example%d.jpg" % i))
            plt.close(fig)

        # gif: bordered output vs ground-truth strips (reference
        # physics_models.py:286-301)
        out_nhwc = np.transpose(output_seq, (0, 1, 3, 4, 2))
        gt_nhwc = np.transpose(batch_x, (0, 1, 3, 4, 2))
        if ch == 1:
            out_nhwc = np.repeat(out_nhwc, 3, axis=-1)
            gt_nhwc = np.repeat(gt_nhwc, 3, axis=-1)
        bordered_out = 0.5 * np.ones(
            [batch_size, model.seq_len, h + 2, w + 2, 3])
        bordered_gt = 0.5 * np.ones_like(bordered_out)
        bordered_out[:, :, 1:-1, 1:-1] = out_nhwc
        bordered_gt[:, :, 1:-1, 1:-1] = gt_nhwc
        strip_out = np.concatenate(list(bordered_out), axis=-2)
        strip_gt = np.concatenate(list(bordered_gt), axis=-2)
        frames = np.concatenate([strip_out, strip_gt], axis=1)
        gif(os.path.join(self.save_dir,
                         "animation%d.gif" % (batch_x.shape[0] - 1)),
            frames * 255, fps=7, scale=3)

        # extra_outputs.npz (keys per reference physics_models.py:304-313)
        np.savez_compressed(
            os.path.join(self.save_dir, "extra_outputs.npz"),
            contents=extras["contents"],
            templates=extras["templates"],
            background_content=extras["background_content"],
            transf_contents=extras["transf_contents"],
            transf_masks=extras["transf_masks"],
            enc_masks=extras["enc_masks"],
            masked_objs=extras["masked_objs"])

        # templates.jpg: sigmoid(contents) above sigmoid(template - 5)
        # (reference physics_models.py:314-328)
        contents = np.transpose(extras["contents"], (0, 2, 3, 1))
        templates = np.transpose(extras["templates"], (0, 2, 3, 1))
        contents = 1 / (1 + np.exp(-contents))
        templates = 1 / (1 + np.exp(-(templates - 5)))
        if ch == 1:
            contents = np.tile(contents, [1, 1, 1, 3])
        templates = np.tile(templates, [1, 1, 1, 3])
        total_seq = np.concatenate([contents, templates], axis=0)
        result = gallery(total_seq, ncols=model.n_objs)
        fig, ax = plt.subplots(figsize=figsize)
        ax.imshow(np.squeeze(result), interpolation="nearest",
                  cmap=cm.Greys_r, norm=norm)
        ax.get_xaxis().set_visible(False)
        ax.get_yaxis().set_visible(False)
        fig.tight_layout()
        fig.savefig(os.path.join(self.save_dir, "templates.jpg"))
        plt.close("all")
