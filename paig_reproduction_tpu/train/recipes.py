"""Single-command training recipes: the in-run machinery that turns the
measured multi-stage discovery -> identify -> align pipeline into ONE
reference-style invocation (VERDICT r3 item 1; no reference counterpart —
the reference has no recovery or staging machinery at all,
nn/network/base.py:112-172).

``RecipeMixin`` hosts everything train_model consults beyond the
reference loop semantics:

* ``--discovery_restarts`` random-restart object discovery
* ``--aux_on_recons``      staged activation of the alignment losses
* ``--fit_physics_every``  train-time closed-form physics identification
* ``--auto_rescue``        in-training slot-rescue surgery

The reference-parity loop itself (epoch loop, eval cadence, artifacts,
checkpoint semantics) stays in trainer.py.
"""
from __future__ import annotations

import logging
import os

import jax
import jax.numpy as jnp
import numpy as np

from paig_reproduction_tpu.parallel.distributed import (
    global_index_batches,
    global_put_replicated,
)
from paig_reproduction_tpu.parallel.mesh import opt_state_shardings
from paig_reproduction_tpu.train import optimizers as opt_lib

logger = logging.getLogger("paig")


class RecipeMixin:
    """Recipe machinery mixed into Trainer (trainer.py). Assumes the
    Trainer attribute surface: model, mesh, params, opt_state, tx, step,
    train/valid iterators, _compile_steps, _fused_* predicates."""

    def set_aux_trigger(self, recons_threshold: float):
        """Arm the --aux_on_recons discovery trigger (call after
        build_optimizer): aux losses are held off (warmup = +inf) until
        the first valid eval with recons below the threshold; the
        train-time physics fit waits for the same signal."""
        self.aux_on_recons = float(recons_threshold)
        self._aux_triggered = False
        if self.aux_on_recons > 0:
            self.aux_warmup_steps = 1 << 30

    # ----- discovery restarts ------------------------------------------------
    def _train_epochs_raw(self, n_epochs, batch_size):
        """Bare training for ``n_epochs`` iterator epochs: no eval, save,
        logging, or trigger machinery. Used by the --discovery_restarts
        arms, where only the end-state matters."""
        use_fused = self._fused_train_enabled(batch_size)
        chunk_k = self._chunk_len()
        target = self.train_iterator.epochs_completed + n_epochs
        warmup = jnp.asarray(self.aux_warmup_steps, jnp.int32)
        while self.train_iterator.epochs_completed < target:
            self._wd_pet()
            if use_fused:
                # Same dispatch helper as train_model's hot loop — chunk
                # semantics must not drift between the two.
                self._dispatch_fused_chunk(batch_size, chunk_k, warmup)
            else:
                feed_dict, _ = self.get_batch(batch_size,
                                              self.train_iterator)
                self.params, self.opt_state, _ = self._train_step(
                    self.params, self.opt_state,
                    self._put_batch(feed_dict["input"]),
                    jnp.asarray(self.step, jnp.int32), warmup)
                self.step += 1

    def _quick_valid_recons(self, batch_size):
        """Mean valid recons loss with no artifact/visualization work
        (restart-arm selection signal)."""
        it = self.valid_iterator
        it.reset_epoch()
        n = it.X.shape[0]
        if n < 100:
            batch_size = n
        raw = getattr(it, "raw_uint8", None)
        if self._fused_eval_enabled(it, batch_size):
            self._wd_pet()
            self._ensure_eval_u8("valid", raw)
            idxs = it.next_index_batches(batch_size, 10 ** 9).astype(
                np.int32)
            m = self._eval_chunk(
                self.params, self._eval_u8["valid"],
                global_index_batches(idxs, self._idx_sharding()))
            return float(np.asarray(m["eval_recons_loss"]).mean())
        vals = []
        while it.get_epoch() < 1:
            self._wd_pet()
            feed_dict, _ = self.get_batch(batch_size, it)
            m = self._eval_step(self.params,
                                self._put_batch(feed_dict["input"]))
            vals.append(float(np.asarray(m["eval_recons_loss"])))
        return float(np.mean(vals))

    def run_discovery_restarts(self, batch_size, restarts, arm_epochs,
                               keep_going_below: float = 0.0):
        """Random-restart object discovery (--discovery_restarts).

        TPU-side extension with no reference counterpart: the reference
        README warns that unsupervised object discovery is seed-sensitive
        (reference README.md:79-81), and it is — discovery either breaks
        the two-slots-one-object symmetry in the first ~50 epochs or
        settles into the dead-slot attractor for the rest of the run
        (benchmarks/CONVERGENCE.md). Restarts convert that coin flip into
        an algorithm: train ``restarts`` independent arms (fresh params
        from fold_in(seed, arm), fresh optimizer state, the ongoing
        shuffle stream) for ``arm_epochs`` epochs each, score each arm by
        valid recons, and continue the run from the best arm. Arm 0 uses
        PRNGKey(seed) exactly, so --discovery_restarts=1 reproduces the
        plain run. A 150-epoch spring arm costs ~1 min of TPU compute, so
        even 6 arms are cheap next to a 1000-epoch run.

        If ``keep_going_below`` > 0, arms stop early once one scores
        under it (discovery clearly succeeded; no need to pay for more).
        Returns the per-arm scores."""
        assert self.params is not None and self.tx is not None, \
            "init_params/build_optimizer before run_discovery_restarts"
        self.add_train_logger()
        base_key = jax.random.PRNGKey(self.seed)
        scores = []
        best = None                     # (recons, params, opt_state, step)
        for arm in range(restarts):
            key = base_key if arm == 0 else jax.random.fold_in(base_key,
                                                               arm)
            variables = self.model.init(key, jnp.asarray(self._init_batch))
            # Place under the compiled steps' shardings: a raw init is
            # committed to one device, which would force a recompile and
            # train tensor-sharded runs unsharded. (global_put_replicated:
            # multi-process runs init identical arms on every host and a
            # plain device_put cannot target non-addressable devices.)
            self.params = jax.tree.map(global_put_replicated,
                                       variables["params"],
                                       self._param_shardings)
            st = self.tx.init(self.params)
            self.opt_state = jax.tree.map(
                global_put_replicated, st,
                opt_state_shardings(st, self.mesh))
            self.step = 0
            self._train_epochs_raw(arm_epochs, batch_size)
            recons = self._quick_valid_recons(batch_size)
            scores.append(recons)
            logger.info("discovery restart arm %d/%d: valid recons %.3f "
                        "after %d epochs", arm + 1, restarts, recons,
                        arm_epochs)
            # NaN-scored arms (diverged) must never win: `x < nan` is
            # always False, so a NaN first arm would otherwise block
            # every later finite arm.
            if np.isfinite(recons) and (best is None or recons < best[0]):
                best = (recons, self.params, self.opt_state, self.step)
            if keep_going_below > 0 and recons < keep_going_below:
                break
        if best is None:
            logger.warning("discovery restarts: every arm diverged "
                           "(scores %s); continuing from the last arm",
                           scores)
            best = (scores[-1], self.params, self.opt_state, self.step)
        recons, self.params, self.opt_state, self.step = best
        self._epochs_consumed = arm_epochs
        logger.info("discovery restarts: continuing from arm %d "
                    "(valid recons %.3f; arms %s)", scores.index(recons),
                    recons, ["%.2f" % s for s in scores])
        # train_model keys its epoch loop on the iterator's ABSOLUTE
        # epoch counter, which the arms advanced — rewind it so the
        # remaining-epochs loop actually runs.
        self.train_iterator.reset_epoch()
        return scores

    # ----- auto-rescue surgery ----------------------------------------------
    def _discovery_stalled(self, ep, recons,
                           min_rel_improve: float = 0.05):
        """Stall guard for --auto_rescue: surgery is for runs STUCK in
        the attractor, not runs still descending (late discovery in
        progress — measured on runs/spring_one5: both balls visibly
        tracked at recons ~5 and improving when the epoch-count trigger
        alone would have reset the slots). Stalled = less than
        ``min_rel_improve`` relative improvement vs the most recent
        valid eval at least auto_rescue/2 epochs back. With no eval that
        far back (sparse cadence), treat as stalled (legacy behavior)."""
        lookback = max(1, self.auto_rescue // 2)
        past = [r for (e, r) in self._recons_history if e <= ep - lookback]
        if not past:
            return True
        baseline = past[-1]
        if not np.isfinite(baseline) or baseline <= 0:
            return True
        improving = (baseline - recons) / baseline >= min_rel_improve
        if improving:
            logger.info(
                "auto_rescue: deferred at epoch %d — recons %.3f still "
                "improving (%.1f%% over the last %d epochs)", ep, recons,
                100.0 * (baseline - recons) / baseline, lookback)
        return not improving

    def _do_auto_rescue(self, ep, recons):
        """In-training slot-rescue surgery (--auto_rescue): the in-place
        version of tools/slot_rescue.py + a frozen-background resume,
        folded into one run. Fires at most once, at the first valid eval
        with epoch >= auto_rescue whose recons is still above
        rescue_recons — the measured signature of the dead-slot /
        background-absorption attractor every hard task landed in
        (benchmarks/CONVERGENCE.md; the reference has no recovery path,
        nn/network/physics_models.py).

        Surgery (train/surgery.py, exact final-bias installs):
        * slots with < 25% of the healthiest slot's visible template
          mass are dead -> reset to centered-disk templates + mid-gray
          contents (the mnist rescue). If NO slot reads dead but recons
          is stuck, the templates have ballooned into background duty
          (the 3bp failure) -> reset ALL slots.
        * the background is pinned to the pixelwise median of the train
          split (exact for these static-background datasets) and FROZEN
          by rebuilding the optimizer with bg_lr_mult=0, so undiscovered
          objects are the only residual left for the rescued slots.
        * the optimizer state is re-initialized: stale curvature moments
          for surgically edited layers point the wrong way (same
          rationale as the tool; the LR schedule restarts with it).
        """
        from paig_reproduction_tpu.train import surgery
        if jax.process_count() > 1 and not all(
                getattr(leaf, "is_fully_replicated", True)
                for leaf in jax.tree.leaves(self.params)):
            # Multi-host DP keeps params fully replicated, so every
            # process recovers the full value locally and computes the
            # IDENTICAL surgery from the identical host dataset — no
            # broadcast needed (tested in tests/test_distributed.py).
            # Multi-host TP shards leaves across processes; gathering
            # those is not wired up — the offline tool covers it.
            logger.warning(
                "auto_rescue: skipped — tensor-sharded params span "
                "processes and host-side surgery cannot gather them; "
                "use tools/slot_rescue.py between runs instead")
            self._rescue_count = 10 ** 9
            return
        m = self.model
        host = jax.tree.map(np.asarray, self.params)
        raw = getattr(self.train_iterator, "raw_uint8", None)
        frames = raw if raw is not None else self.train_iterator.X
        bg = surgery.median_background(frames)
        health = surgery.slot_health(host, m.n_objs, m.tmpl_size,
                                     template_init=m.template_init)
        # Salience catches the big-mask / background-colored-content
        # slot (bounce_one1: health [44, 215] but slot 1 painted black
        # on the black background — mask mass alone reset the one slot
        # that tracked a ball; round-5 dry-run on the real checkpoint).
        salience = surgery.slot_salience(host, m.n_objs, m.tmpl_size,
                                         m.conv_ch, bg,
                                         template_init=m.template_init)
        slots = surgery.select_dead_slots(health,
                                          tmpl_px=m.tmpl_size ** 2,
                                          salience=salience)
        radius = self.rescue_disk_radius or (
            9.0 if m.img_size >= 64 else 3.0)
        # --rescue_seed_color: seed each reset slot's contents with the
        # residual color cluster no healthy slot explains. Measured
        # motivation (bounce_one1 + bounce_probe_overlap): a mid-gray
        # disk reset re-dies on bouncing_balls — recons stays flat at
        # ~10.4 — because nothing pulls the fresh slot toward the
        # unexplained ball; a slot already colored like that ball gets
        # recons gradient to move onto it from step one.
        seeds = {}
        if getattr(self, "rescue_seed_color", False):
            try:
                colors = surgery.object_pixel_colors(frames, bg)
                if colors.shape[0] >= 8 * m.n_objs:
                    clusters = surgery.color_clusters(colors, m.n_objs)
                    slot_cols = surgery.slot_content_colors(
                        host, m.n_objs, m.tmpl_size, m.conv_ch,
                        template_init=m.template_init)
                    taken = [slot_cols[i] for i in range(m.n_objs)
                             if i not in slots]
                    picked = surgery.pick_seed_colors(
                        clusters, taken, len(slots))
                    seeds = dict(zip(slots, picked))
            except Exception:
                logger.exception("rescue_seed_color failed; falling back "
                                 "to mid-gray seeds")
        for s in slots:
            # Mid-gray fallback sized to the model's channel count — a
            # 3-channel literal broadcast-errors on grayscale runs
            # (conv_ch == 1, ADVICE r4).
            host = surgery.rescue_slot(
                host, s, m.n_objs, m.tmpl_size, m.conv_ch, radius=radius,
                content_rgb=seeds.get(s, (0.5,) * m.conv_ch),
                template_init=m.template_init)
        host = surgery.set_background(host, bg)
        self.params = host
        self._rescue_count += 1
        self._last_rescue_ep = ep
        self._rescue_step = self.step
        logger.info(
            "auto_rescue: epoch %d valid recons %.3f > %.3f — slot "
            "health %s salience %s; reset slot(s) %s to disk priors (r=%.1f), "
            "pinned the median background and froze it (bg_lr_mult=0), "
            "optimizer state re-initialized (rescue %d/%d)%s", ep, recons,
            self.rescue_recons, [int(v) for v in health],
            [round(float(v), 3) for v in salience], slots, radius,
            self._rescue_count, self.max_rescues,
            "; seed colors " + str(
                {s: np.round(c, 3).tolist() for s, c in seeds.items()})
            if seeds else "")
        a = self._opt_args
        # The rebuilt schedule's internal count restarts at 0, so size it
        # to the REMAINING epochs — sizing it to the original horizon
        # would leave an --anneal_lr run ending at a mid-schedule LR.
        schedule = opt_lib.lr_schedule(
            self.base_lr,
            # Remaining horizon: the original budget minus any
            # pre-loop (--discovery_restarts) epochs minus the loop
            # epochs already run (`ep` is relative to the loop).
            max(1, a["epochs"] - self._epochs_consumed - ep),
            a["steps_per_epoch"], self.anneal_lr)
        self.tx = opt_lib.build_optimizer(
            a["optimizer"], schedule, host,
            physics_lr_mult=a["physics_lr_mult"],
            grad_clip=a["grad_clip"], bg_lr_mult=0.0)
        self.opt_state = self.tx.init(host)
        # Recompile the step functions against the new optimizer. The
        # mesh is unchanged: keep the device-resident splits and any
        # in-flight npz writer (preserve_data).
        self._compile_steps(preserve_data=True)

    # ----- train-time physics identification ---------------------------------
    def _identify_physics(self, batch_size):
        """Train-time closed-form physics re-identification
        (--fit_physics_every): fit (k, equil) / g by trajectory least
        squares on the model's OWN encoder positions (ops/identify.py —
        fully unsupervised, same math as tools/fit_physics.py) and
        install the result into the live params. This is what turns the
        measured discovery->identify->align pipeline into a single
        command: the pixel loss cannot pull the physical parameters out
        of the ballistic basin (vanishing gradient once objects stop
        overlapping), but the encoder it trains identifies them exactly.

        The raw encoder positions are window coordinates, offset from
        each object's APPEARANCE center by a per-slot constant (the
        learned template need not be centered). The pairwise laws are
        not offset-invariant, so the fit corrects by render-measured
        centroid offsets first (measured on runs/ph7: raw fit k=0.71
        err=164 — garbage at the failure scale of the spring_one2
        collapse — vs offset-corrected k=4.49 equil=6.02 err=5.7,
        truth 4/6), aligns slot identities, and rejects fits landing on
        the search-grid edges. On acceptance the measured offsets are
        installed into the frame_offset parameter (when
        --learn_frame_offset) so the rollout runs in the same
        appearance-centroid frame the fit used.
        """
        cell = self.model.cell_type
        if cell not in ("spring_ode_cell", "gravity_ode_cell"):
            return
        from paig_reproduction_tpu.ops import cells as _cells
        from paig_reproduction_tpu.ops import identify
        _, dt = _cells.CELLS[cell]
        encs = []
        for _ in range(4):
            bx, _ = self.train_iterator.sample_random_batch(
                min(batch_size, self.train_iterator.num_examples - 1))
            # Replicated upload (not _put_batch's data-sharded one): the
            # fit fetches enc_pos to the host, and a batch sharded across
            # processes yields non-addressable outputs np.asarray cannot
            # read. Every process draws the identical batch (shared RNG
            # contract, parallel/distributed.py) and computes the
            # identical fit.
            _, aux = self._forward(self.params,
                                   self._put_batch_replicated(bx))
            encs.append(np.asarray(aux["enc_pos"]))
        enc = np.concatenate(encs)              # [N, t_in, n_objs*2]
        offsets = self._rendered_offsets()
        enc = identify.align_slots(enc + offsets[None, None],
                                   self.model.n_objs)
        # Acceptance gate: install the fit only when it explains the
        # encoder trajectories BETTER than the current parameters. A
        # pre-discovery encoder emits garbage positions, the grid fit
        # lands on its edge, and installing that would overwrite a
        # possibly-sane physics state; the comparison makes the hook
        # monotone under the fit's own objective.
        p = dict(self.params)
        if cell == "spring_ode_cell":
            k, equil, err = identify.fit_spring_trajectory(
                enc, dt, input_steps=self.model.input_steps,
                substeps=self.model.cell_substeps)
            cur_err = identify.spring_trajectory_error(
                enc, dt, float(np.exp(p["log_k"])),
                float(np.exp(p["log_equil"])),
                input_steps=self.model.input_steps,
                substeps=self.model.cell_substeps)
            if (identify.on_bounds(k, identify.SPRING_K_BOUNDS)
                    or identify.on_bounds(equil, identify.SPRING_E_BOUNDS)):
                logger.info("fit_physics: rejected (k=%.3f equil=%.3f on "
                            "search bounds — no interior optimum)",
                            k, equil)
                return
            if err >= 0.75 * cur_err:
                logger.info("fit_physics: rejected (fit err %.3f not "
                            "decisively under current %.3f)", err, cur_err)
                return
            p["log_k"] = jnp.asarray(np.log(max(k, 1e-3)), jnp.float32)
            p["log_equil"] = jnp.asarray(np.log(max(equil, 1e-3)),
                                         jnp.float32)
            logger.info("fit_physics: k=%.4f equil=%.4f "
                        "(median traj err %.3f, was %.3f)",
                        k, equil, err, cur_err)
        else:
            A, err = identify.fit_gravity_trajectory(
                enc, dt, input_steps=self.model.input_steps,
                substeps=self.model.cell_substeps)
            cur_err = identify.gravity_trajectory_error(
                enc, dt, float(np.exp(p["log_g"])),
                input_steps=self.model.input_steps,
                substeps=self.model.cell_substeps)
            if identify.on_bounds(A, identify.GRAVITY_A_BOUNDS):
                logger.info("fit_physics: rejected (A=%.3f on search "
                            "bounds — no interior optimum)", A)
                return
            if err >= 0.75 * cur_err:
                logger.info("fit_physics: rejected (fit err %.3f not "
                            "decisively under current %.3f)", err, cur_err)
                return
            # A = exp(log_g)*exp(2*log_m), log_m frozen at 0
            p["log_g"] = jnp.asarray(np.log(max(A, 1e-3)), jnp.float32)
            logger.info("fit_physics: A=g*m^2=%.4f "
                        "(median traj err %.3f, was %.3f)", A, err,
                        cur_err)
        if "frame_offset" in p:
            # Run the rollout in the appearance-centroid frame the fit
            # used (pos_phys = pos_enc + frame_offset).
            p["frame_offset"] = jnp.asarray(offsets, jnp.float32)
        self.params = p
        if (self.aux_on_recons > 0 and self._aux_triggered
                and self.aux_warmup_steps >= (1 << 30)):
            # Two-stage staging: the recons trigger armed the fits; the
            # first ACCEPTED fit turns the physics-alignment losses on.
            # Enabling them on the recons trigger alone anchored the
            # encoder to rollouts under still-uninitialized physics and
            # collapsed the model (runs/spring_one2).
            self.aux_warmup_steps = self.step
            logger.info(
                "fit_physics: first accepted fit — physics-alignment "
                "losses now active (step %d)", self.step)

    def _rendered_offsets(self) -> np.ndarray:
        """Per-slot appearance-centroid offsets in image px (obj-major
        x, y, flat [n_objs*2]): centroid of each object's OWN rendered
        appearance (composited softmax mask x content luminance) minus
        the encoder position it was rendered at — exactly the constant a
        pixel tracker sees between the window coordinate and the object
        center. Median over frames is robust to boundary clipping. Same
        estimator as tools/fit_physics.py (the earlier template-centroid
        variant was up to 6 px off on mnist digits)."""
        n = min(8, self.train_iterator.num_examples)
        bx = self.train_iterator.X[:n]
        # Replicated for the same host-fetch reason as _identify_physics.
        _, aux = self._forward_extras(self.params,
                                      self._put_batch_replicated(bx))
        masks = np.asarray(aux["extras"]["transf_masks"])    # [F,o+1,H,W]
        conts = np.asarray(aux["extras"]["transf_contents"])  # [F,o,H,W,C]
        pos_at = np.asarray(aux["enc_pos"]).reshape(
            -1, self.model.n_objs, 2)
        lum = conts.mean(axis=-1)
        w = masks[:, : self.model.n_objs] * lum               # [F,o,H,W]
        hh, ww = w.shape[-2:]
        xs = np.arange(ww, dtype=np.float64) + 0.5
        ys = np.arange(hh, dtype=np.float64) + 0.5
        tot = w.sum(axis=(2, 3)) + 1e-9
        cx = (w.sum(axis=2) * xs).sum(-1) / tot
        cy = (w.sum(axis=3) * ys).sum(-1) / tot
        per_frame = np.stack([cx, cy], axis=-1) - pos_at      # [F,o,2]
        return np.median(per_frame, axis=0).reshape(-1)
