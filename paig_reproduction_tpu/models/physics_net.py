"""PhysicsNet: the PAIG model as a single jittable flax module.

Capability parity with the reference ``nn/network/physics_models.py:40-331``:
encoder -> velocity estimator -> differentiable-physics rollout -> ST
decoder, trained unsupervised from video.

TPU-native design decisions (vs. the reference's per-step Python loop):

* The rollout is a ``jax.lax.scan`` whose body fuses the ODE cell substeps
  and the separable-matmul ST decoder into one compiled region
  (reference loops in Python, ``physics_models.py:231-239``).
* Decoder assets (templates/contents/background) are computed once per
  forward pass, not once per step.
* Internal layout is NHWC; the public API keeps the reference's
  ``[B, T, C, H, W]`` float32 input.
* Training uses the intended gradient semantics: the loss consumes the
  FRESH rollout output, so the velocity encoder and the physical
  parameters (log k, log equil, log g) receive gradients. The reference's
  training loss reads a stale eval-time output and only trains the
  autoencoder path (see SURVEY.md §3.1); metric definitions are identical.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from paig_reproduction_tpu.models.blocks import (
    ConvolutionalEncoder,
    TorchDense,
    VariableFromNetwork,
    VelocityEncoder,
)
from paig_reproduction_tpu.models.decoder import (
    DecoderAssets,
    DecoderConfig,
    st_decode,
)
from paig_reproduction_tpu.ops import cells
from paig_reproduction_tpu.ops.cells import CellParams
from paig_reproduction_tpu.ops.pos_refine import refine_positions
from paig_reproduction_tpu.ops.state_fit import (
    fit_initial_state,
    fit_initial_state_bouncing,
)

def _replicate_if_mesh(x: jnp.ndarray) -> jnp.ndarray:
    """Constrain ``x`` to be replicated when tracing under a device mesh.

    The tensor-parallel param shardings (parallel/mesh.py) shard the
    VariableFromNetwork output projections over the 'model' axis, so the
    matmul itself runs sharded — but the resulting decoder assets are tiny
    and are sliced per-object inside the rollout scan. Without an explicit
    constraint GSPMD propagates the matmul sharding into those slices and
    falls back to replicate-then-partition EVERY scan step ("Involuntary
    full rematerialization", spmd_partitioner.cc:652). Replicating the
    assets once, right after they are produced, turns that into a single
    all-gather per forward. No-op without a mesh context
    (``jax.sharding.set_mesh``)."""
    if jax.sharding.get_abstract_mesh().empty:
        return x
    return jax.lax.with_sharding_constraint(
        x, jax.sharding.PartitionSpec())


# Latent units per task: coord_units = n_objects * 2 (dims) * 2 (pos+vel)
# (reference physics_models.py:31-37).
COORD_UNITS = {
    "bouncing_balls": 8,
    "spring_color": 8,
    "spring_color_half": 8,
    "3bp_color": 12,
    "mnist_spring_color": 8,
}


class PhysicsNet(nn.Module):
    """See module docstring. Constructor args mirror the reference CLI
    (reference physics_models.py:41-55)."""

    task: str = "spring_color"
    recurrent_units: int = 100
    lstm_layers: int = 1
    cell_type: str = "spring_ode_cell"
    seq_len: int = 12
    input_steps: int = 4
    pred_steps: int = 6
    autoencoder_loss: float = 0.0
    alt_vel: bool = False
    color: bool = True
    input_size: int = 32 * 32
    encoder_type: str = "conv_encoder"
    decoder_type: str = "conv_st_decoder"
    # [extension] ST-decoder compute backend: "xla" (separable matmuls),
    # "pallas" (fused VMEM kernel forward, XLA backward), or "auto".
    # Benchmarked on TPU v5e in benchmarks/DECODER_BENCH.md: the XLA path
    # wins inside the fused train step (XLA fuses the decode into the
    # scan body; the kernel's win on the isolated op does not survive
    # composition), so "auto" resolves to "xla" everywhere. The pallas
    # path stays available and parity-tested for larger-image model
    # families where the fused composite outgrows what XLA fuses well.
    decoder_backend: str = "auto"
    # [extension, default off] bug-compatible training-gradient path: the
    # reference's train step computes the pred/extrap terms against a
    # STALE no_grad eval output (reference base.py:142,195 +
    # physics_models.py:130), so gradients reach ONLY the
    # encoder/decoder via the autoencoder_loss*recons term — the velocity
    # encoder and the ODE cell's physical parameters never train. With
    # this flag the pred term enters the train loss under stop_gradient,
    # reproducing that gradient path exactly for curve-level A/B
    # comparisons. Loss VALUES still use the fresh rollout (the
    # reference's stale constants depend on its eval cadence and batch,
    # which is not a well-defined function of the training state).
    # Default off: the intended end-to-end semantics (SURVEY.md §3.1).
    reference_quirks: bool = False
    # [extension] computation dtype for the encoder conv stack:
    # "float32" (default, reference-faithful) or "bfloat16" (runs the
    # UNet convs + wide encoder matmuls at the MXU's doubled bf16 rate
    # with f32 master weights; positions, physics, decoder and losses
    # stay f32 — see blocks.ConvolutionalEncoder.dtype).
    compute_dtype: str = "float32"
    # [extension, default off] weight of a template-centering penalty.
    # Unsupervised object discovery can settle on templates whose content
    # sits off-center; the encoder then reports ball_center + offset, and
    # offset coordinates do not obey the physical force law, collapsing
    # the learnable physics (k -> 0). Penalizing the distance between the
    # template-mask centroid and the template center removes that failure
    # mode without changing any reference metric definition.
    template_center_loss: float = 0.0
    # [extension, default off] weight of a blurred-image auxiliary
    # prediction loss (training only; eval metrics unchanged). Pixel
    # losses on 4-px objects give zero gradient once prediction and
    # target stop overlapping; matching 7x7-box-blurred frames extends
    # the gradient's capture range so the physical parameters receive
    # signal from the whole rollout horizon.
    coarse_loss: float = 0.0
    # [extension, default off] weight of a velocity-anchor penalty tying
    # the velocity encoder's output to the finite difference of the last
    # two encoded positions (/dt), removing one axis of co-adaptation
    # between the velocity head and the physical parameters.
    vel_anchor: float = 0.0
    # [extension, default off] during --aux_warmup_epochs also gate the
    # PREDICTION term, training pure autoencoder first. Unsupervised
    # object discovery is most reliable under recons-only training — the
    # reference does this by accident (its pred term reads a stale
    # detached output, SURVEY.md §3.1), and live rollout gradients from
    # step 0 measurably degrade discovery.
    recons_warmup: bool = False
    # [extension] Euler substeps per rollout frame. 5 matches the
    # reference cells (cells.py:35); the dataset generators integrate
    # with 10 (generators.py:323), so 10 lets the model class match the
    # data's discretization exactly.
    cell_substeps: int = 5
    # [extension, default off] learn a per-object coordinate-frame offset
    # b_o: the rollout integrates physics in pos + b_o and decodes at
    # (pos_phys - b_o). Unsupervised discovery leaves each template's
    # content off-center by some constant, so encoder coordinates are
    # true centers + per-object offsets — and offset coordinates do NOT
    # obey the force law (a spring between shifted points is not a
    # spring). The offsets absorb that nuisance DOF exactly; with a
    # centered encoder they train to zero.
    learn_frame_offset: bool = False
    # [extension, default off] weight of a position-space consistency
    # loss: the rollout positions for the pred window are regressed onto
    # the (stop-gradient) encoder positions of the same frames. The pixel
    # loss has a ~object-radius capture range — once predicted and target
    # objects stop overlapping, the physical parameters get zero gradient
    # and collapse to ballistic motion; the coordinate-space loss is
    # smooth over the whole domain and pulls (k, equil, g) and the
    # velocity head toward the dynamics the encoder actually observes.
    # Still fully unsupervised (targets are the model's own encodings).
    pos_consistency: float = 0.0
    # [extension, default off] weight of a slot-overlap penalty: the sum
    # of pixelwise products of distinct object attention masks. Object
    # discovery on the bouncing task reliably collapses both object slots
    # onto the SAME ball (measured: both templates learn the green ball,
    # the blue one goes unexplained, recons ~11 across 10 seed/recipe
    # runs); a spatial-exclusivity prior — objects occupy disjoint pixels
    # — makes the collapsed configuration unstable without affecting
    # disjoint (correct) solutions. Applied from step 0 (discovery-phase
    # loss, NOT gated by --aux_warmup_epochs).
    attn_overlap_loss: float = 0.0
    # [extension, default off] slot curriculum: only the first
    # active_slots object slots are live (0 = all). From-scratch
    # discovery on >=2-fast-object / 3-object tasks reliably collapses
    # all slots onto one object (see attn_overlap_loss note); activating
    # slots one stage at a time makes each new slot's strongest gradient
    # the still-unexplained object. Parameter shapes are identical across
    # stages, so staged runs resume from each other's checkpoints
    # (`--use_ckpt`). Run discovery stages with --recons_warmup
    # --aux_warmup_epochs=<stage> so inactive-slot garbage positions
    # never reach the prediction loss.
    active_slots: int = 0
    # [extension, default off] object-prior template initialization: the
    # template mask logits start as a centered disk of this radius (in
    # template pixels; 0 = reference random init). Random-init templates
    # begin as noise, so nothing looks like an object until discovery
    # bootstraps; a small centered bump gives every slot an object
    # hypothesis from step 0 — its position gradient then tracks bright
    # blobs instead of re-inventing "objectness".
    template_init: float = 0.0
    # [extension] soft encoder gate for the slot curriculum (see
    # blocks.ConvolutionalEncoder.slot_gate_soft; 0 = hard gate). The
    # decoder always hard-gates inactive slots regardless.
    slot_gate_soft: float = 0.0
    # [extension, default off] Gauss-Newton iterations for the dynamics-
    # consistent initial-state fit (ops/state_fit.py): the rollout start
    # state is least-squares fitted to the encoder positions of the whole
    # input window under the learned dynamics, instead of taken from the
    # last frame + MLP velocity. Uses input-window information only.
    init_state_fit: int = 0
    # [extension, default off] Gauss-Newton iterations of render-based
    # subpixel refinement of the input-window positions before the
    # rollout/state fit (ops/pos_refine.py): the model's own ST decoder
    # localizes objects 3-10x below the encoder MLP's noise floor. Only
    # the rollout's observation window is refined; the autoencoder path
    # and its training gradients are untouched.
    refine_enc_pos: int = 0
    # [extension, default off] Same render-based GN refinement applied to
    # EVERY encoded frame's positions before the autoencoder decode: cuts
    # the sub-pixel edge-ring error that dominates eval_recons_loss once
    # discovery has landed (measured on mnist: 72% of recons SSE sits in
    # a 2px ring around object edges). Gradients pass straight through
    # the refinement to the encoder MLP (evaluated at the refined
    # positions); subsumes refine_enc_pos when > 0 (the rollout window is
    # sliced from the refined positions). Intended for eval/test;
    # training with it on costs iters x cu2 extra decoder passes.
    refine_recons_pos: int = 0

    # ----- derived static properties -------------------------------------
    @property
    def conv_ch(self) -> int:
        return 3 if self.color else 1

    @property
    def img_size(self) -> int:
        return int(np.sqrt(self.input_size))

    @property
    def coord_units(self) -> int:
        return COORD_UNITS[self.task]

    @property
    def n_objs(self) -> int:
        return self.coord_units // 4

    @property
    def extrap_steps(self) -> int:
        return self.seq_len - self.input_steps - self.pred_steps

    @property
    def tmpl_size(self) -> int:
        return self.img_size // 2

    def _validate(self):
        assert self.task in COORD_UNITS, self.task
        assert self.seq_len > self.input_steps + self.pred_steps
        assert self.input_steps >= 1 and self.pred_steps >= 1
        assert self.decoder_type == "conv_st_decoder", self.decoder_type
        assert self.encoder_type == "conv_encoder", (
            f"unknown encoder_type {self.encoder_type!r}; only "
            "'conv_encoder' exists (reference parity: the reference also "
            "has exactly one encoder, torch_run_physics.py:29)")
        assert self.lstm_layers >= 1, self.lstm_layers
        assert self.decoder_backend in ("auto", "xla", "pallas"), (
            self.decoder_backend)
        assert self.compute_dtype in ("float32", "bfloat16"), (
            self.compute_dtype)

    @property
    def _backend(self) -> str:
        """Resolved decoder backend ("auto" -> measured winner; see the
        decoder_backend field note)."""
        if self.decoder_backend != "auto":
            return self.decoder_backend
        return "xla"

    def _decoder_cfg(self) -> DecoderConfig:
        return DecoderConfig(
            img_hw=(self.img_size, self.img_size),
            tmpl_size=self.tmpl_size,
            n_objs=self.n_objs,
            conv_ch=self.conv_ch,
            log_sig=1.0,
        )

    @nn.compact
    def __call__(self, inp: jnp.ndarray, with_extras: bool = False
                 ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        """inp: [B, T, C, H, W] float32 in [0, 1] (reference data layout).

        Returns (output_seq [B, pred+extrap, C, H, W], aux dict with
        recons_out, enc_pos, pos_vel_seq and optional visualization
        extras)."""
        self._validate()
        b, t = inp.shape[0], inp.shape[1]
        img, ch = self.img_size, self.conv_ch
        t_in = self.input_steps + self.pred_steps
        cfg = self._decoder_cfg()

        x = inp.transpose(0, 1, 3, 4, 2)                # -> [B, T, H, W, C]

        # --- decoder assets: computed once per forward --------------------
        # (reference builds these inside every decoder call,
        # physics_models.py:163-187; shapes match physics_models.py:106-108)
        contents_raw = VariableFromNetwork(
            (self.n_objs, self.tmpl_size, self.tmpl_size, ch),
            name="var_net_content")()
        background_raw = VariableFromNetwork(
            (img, img, ch), name="var_net_background")()
        tmpl_prior = None
        if self.template_init > 0:
            # centered-disk logit prior: +6 inside radius, -6 outside
            # (the decoder's +5/-5 trick keeps out-of-support at -5, so
            # these magnitudes put the prior mask firmly on/off).
            c = (self.tmpl_size - 1) / 2.0
            yy, xx = jnp.mgrid[: self.tmpl_size, : self.tmpl_size]
            rr = jnp.sqrt((yy - c) ** 2 + (xx - c) ** 2)
            disk = jnp.where(rr <= self.template_init, 6.0, -6.0)
            tmpl_prior = jnp.tile(disk[None], (self.n_objs, 1, 1))
        template_raw = VariableFromNetwork(
            (self.n_objs, self.tmpl_size, self.tmpl_size),
            init_bias=tmpl_prior, name="var_net_template")()
        if 0 < self.active_slots < self.n_objs:
            # Slot curriculum (see field note): inactive slots become
            # invisible — template logits to -inf kills their softmax
            # mask everywhere the warp places them.
            slot_gate = jnp.arange(self.n_objs) < self.active_slots
            template_raw = jnp.where(slot_gate[:, None, None],
                                     template_raw, -1e4)

        assets = DecoderAssets(
            template=_replicate_if_mesh(template_raw),
            contents=_replicate_if_mesh(contents_raw),
            background=_replicate_if_mesh(jax.nn.sigmoid(background_raw)),
        )

        # --- encode input+pred frames (batch and time flattened) ----------
        frames = x[:, :t_in].reshape(b * t_in, img, img, ch)
        enc_pos_flat, enc_masks, masked_objs = ConvolutionalEncoder(
            input_hw=(img, img), n_objs=self.n_objs, hidden_dim=200,
            out_features=2, active_slots=self.active_slots,
            slot_gate_soft=self.slot_gate_soft,
            dtype=(jnp.bfloat16 if self.compute_dtype == "bfloat16"
                   else None),
            name="encoder")(frames)

        if self.refine_recons_pos > 0:
            enc_pos_flat = refine_positions(
                lambda p: st_decode(assets, p, cfg,
                                    backend=self._backend)[0],
                frames, enc_pos_flat, iters=self.refine_recons_pos)

        # --- autoencoder path ---------------------------------------------
        recons_flat, _ = st_decode(assets, enc_pos_flat, cfg,
                                   backend=self._backend)
        recons_out = recons_flat.reshape(b, t_in, img, img, ch)
        enc_pos = enc_pos_flat.reshape(b, t_in, self.coord_units // 2)

        # --- initial velocity ----------------------------------------------
        if self.input_steps > 1:
            vel = VelocityEncoder(
                alt_vel=self.alt_vel, input_steps=self.input_steps,
                n_objs=self.n_objs, name="velocity_encoder")(
                enc_pos[:, :self.input_steps])
        else:
            vel = jnp.zeros((b, self.coord_units // 2), x.dtype)

        # Observation window feeding the rollout start (and the optional
        # state fit). With --refine_enc_pos the window positions are
        # subpixel-refined against the model's own renderer; the encoder
        # MLP's output still drives the autoencoder loss above.
        obs_win = enc_pos[:, :self.input_steps]
        if self.refine_enc_pos > 0 and self.refine_recons_pos == 0:
            s = self.input_steps
            win_frames = x[:, :s].reshape(b * s, img, img, ch)
            obs_win = refine_positions(
                lambda p: st_decode(assets, p, cfg,
                                    backend=self._backend)[0],
                win_frames, obs_win.reshape(b * s, -1),
                iters=self.refine_enc_pos).reshape(b, s, -1)

        pos = obs_win[:, -1]

        # --- rollout: fused cell + decode scan ------------------------------
        n_steps = self.pred_steps + self.extrap_steps

        if self.cell_type == "lstm":
            # Properly-wired black-box baseline (the reference exposes the
            # flags but never wires the LSTM path; SURVEY.md §2.1). An
            # LSTM cell consumes [pos, vel] and predicts the next state.
            lstms = [nn.OptimizedLSTMCell(self.recurrent_units,
                                          name=f"lstm_{i}")
                     for i in range(self.lstm_layers)]
            proj = TorchDense(self.coord_units, name="lstm_proj")
            carries = [cell.initialize_carry(
                jax.random.PRNGKey(0),
                (b, self.coord_units if i == 0 else self.recurrent_units))
                for i, cell in enumerate(lstms)]
            outs, pos_vels = [], [jnp.concatenate([pos, vel], axis=1)]
            for _ in range(n_steps):
                hid = jnp.concatenate([pos, vel], axis=1)
                for i, cell in enumerate(lstms):
                    carries[i], hid = cell(carries[i], hid)
                pv = proj(hid)
                pos, vel = jnp.split(pv, 2, axis=1)
                out, _ = st_decode(assets, pos, cfg,
                                   backend=self._backend)
                outs.append(out)
                pos_vels.append(jnp.concatenate([pos, vel], axis=1))
            output_seq = jnp.stack(outs, axis=1)
            pos_vel_seq = jnp.stack(pos_vels, axis=1)
        else:
            step_fn, dt = cells.CELLS[self.cell_type]
            cell_params = self._cell_params()
            if self.learn_frame_offset:
                frame_off = self.param(
                    "frame_offset", nn.initializers.zeros,
                    (self.coord_units // 2,))
            else:
                frame_off = jnp.zeros((self.coord_units // 2,), x.dtype)

            pos_phys0, vel0 = pos + frame_off, vel
            if self.init_state_fit > 0 and self.input_steps > 1:
                obs_phys = obs_win + frame_off
                if self.cell_type == "bouncing_ode_cell":
                    # The GN fit's linearization breaks on the bouncing
                    # cell's reflections; the unfolded-space fit is exact
                    # for it (see ops/state_fit.fit_initial_state_bouncing).
                    pos_phys0, vel0 = fit_initial_state_bouncing(
                        obs_phys, vel, dt)
                else:
                    pos_phys0, vel0 = fit_initial_state(
                        step_fn, cell_params, obs_phys, vel, dt,
                        self.cell_substeps, self.init_state_fit)

            def body(carry, _):
                p_phys, v = carry
                p_phys, v = step_fn(cell_params, p_phys, v, dt,
                                    substeps=self.cell_substeps)
                # BPTT stabilizer: identity forward, clipped cotangent
                # backward (see ops/cells.clip_cotangent).
                p_phys = cells.clip_cotangent(p_phys)
                v = cells.clip_cotangent(v)
                return (p_phys, v), (p_phys, v)

            # The scan carries only the (tiny) physics state; frames are
            # decoded OUTSIDE the scan in one batched st_decode over all
            # B*T rollout positions. Per-step decodes inside the scan body
            # are B=100-sized ops that underfill the MXU and pay per-step
            # dispatch; one [B*T, ...] decode is the same math (the decoder
            # has no cross-sample reductions) at far better utilization.
            # B stays the major axis of the flatten so GSPMD keeps the
            # data-sharded batch dim sharded (same layout contract as the
            # encoder's frame flattening above).
            (_, _), (pos_roll, vel_roll) = jax.lax.scan(
                body, (pos_phys0, vel0), None, length=n_steps)
            # scan stacks on axis 0 (time) -> [T, B, k]; make B major.
            pos_roll = jnp.moveaxis(pos_roll, 0, 1)     # [B, T, k]
            vel_roll = jnp.moveaxis(vel_roll, 0, 1)
            p_enc_roll = pos_roll - frame_off
            frames_flat, _ = st_decode(
                assets, p_enc_roll.reshape(b * n_steps, -1), cfg,
                backend=self._backend)
            output_seq = frames_flat.reshape(b, n_steps, img, img, ch)
            pos_vel_seq = jnp.concatenate(
                [jnp.concatenate([pos_phys0 - frame_off, vel0],
                                 axis=1)[:, None],
                 jnp.concatenate([p_enc_roll, vel_roll], axis=2)], axis=1)

        # Template-centering penalty (see class docstring field note):
        # squared distance between each template mask's centroid and the
        # template center, in template pixels.
        mask = jax.nn.sigmoid(template_raw)            # [o, T, T]
        coords = jnp.arange(self.tmpl_size, dtype=mask.dtype)
        total = jnp.sum(mask, axis=(1, 2)) + 1e-6
        cy = jnp.sum(mask.sum(axis=2) * coords, axis=1) / total
        cx = jnp.sum(mask.sum(axis=1) * coords, axis=1) / total
        center = (self.tmpl_size - 1) / 2.0
        center_penalty = jnp.sum((cy - center) ** 2 + (cx - center) ** 2)

        # Slot-overlap penalty (see attn_overlap_loss field note): sum of
        # pixelwise products of distinct object attention masks. Zero for
        # spatially-disjoint slots; large when slots collapse onto the
        # same object.
        attn_obj = enc_masks[..., :self.n_objs]        # [B*T', H, W, o]
        pair = (jnp.sum(attn_obj, axis=-1) ** 2
                - jnp.sum(attn_obj ** 2, axis=-1))     # 2*sum_{o<o'} ao*ao'
        attn_overlap_penalty = 0.5 * jnp.mean(jnp.sum(pair, axis=(1, 2)))

        # Velocity-anchor penalty: the central difference
        # (p_{s} - p_{s-2}) / (2 dt) around the rollout start frame s-1 is
        # an O(dt^2)-unbiased estimate of the instantaneous velocity (the
        # forward difference carries an a*dt/2 bias, ~0.3 px/frame here);
        # frame s is inside the encoder window (input+pred frames).
        vel_anchor_penalty = jnp.zeros((), x.dtype)
        if self.input_steps > 1 and self.cell_type in cells.CELLS:
            _, cell_dt = cells.CELLS[self.cell_type]
            vel_fd = (enc_pos[:, self.input_steps]
                      - enc_pos[:, self.input_steps - 2]) / (2 * cell_dt)
            vel_anchor_penalty = jnp.mean((vel - vel_fd) ** 2)

        # Blurred-image auxiliary prediction loss (box blur 7x7, SAME).
        coarse_pred_loss = jnp.zeros((), x.dtype)
        if self.coarse_loss > 0.0:
            target = x[:, self.input_steps:]           # [B, Tr, H, W, C]
            tr = target.shape[1]

            def blur(frames):
                f = frames.reshape(b * tr, img, img, ch)
                f = jax.lax.reduce_window(
                    f, 0.0, jax.lax.add, (1, 7, 7, 1), (1, 1, 1, 1),
                    "SAME") / 49.0
                return f.reshape(b, tr, img, img, ch)

            diff = blur(target) - blur(output_seq)
            coarse_pred_loss = jnp.mean(
                jnp.sum(diff ** 2, axis=(2, 3, 4)))

        # Position-space consistency: rollout step t produces the state of
        # frame input_steps+t; the encoder saw those frames too.
        cu2 = self.coord_units // 2
        roll_pos = pos_vel_seq[:, 1:1 + self.pred_steps, :cu2]
        enc_tgt = jax.lax.stop_gradient(enc_pos[:, self.input_steps:])
        pos_consistency_loss = jnp.mean(
            jnp.sum((roll_pos - enc_tgt) ** 2, axis=-1))

        aux: Dict[str, Any] = {
            "recons_out": recons_out.transpose(0, 1, 4, 2, 3),  # NCHW out
            "enc_pos": enc_pos,
            "pos_vel_seq": pos_vel_seq,
            "center_penalty": center_penalty,
            "attn_overlap_penalty": attn_overlap_penalty,
            "vel_anchor_penalty": vel_anchor_penalty,
            "coarse_pred_loss": coarse_pred_loss,
            "pos_consistency_loss": pos_consistency_loss,
        }
        if with_extras:
            # Extras for visualize_sequence / extra_outputs.npz parity
            # (reference physics_models.py:304-310). Torch-layout channels
            # -first for npz compatibility.
            dec_frame, dec_extras = st_decode(
                assets, enc_pos_flat, cfg, return_extras=True)
            del dec_frame
            aux["extras"] = {
                # Raw (pre-shift) template, matching self.template in the
                # reference (physics_models.py:163-164); the viz routine
                # applies sigmoid(t - 5) itself (physics_models.py:317).
                "contents": contents_raw.transpose(0, 3, 1, 2),
                "templates": template_raw[:, None],
                "background_content": jax.nn.sigmoid(
                    background_raw).transpose(2, 0, 1)[None],
                "transf_contents": dec_extras["transf_contents"],
                "transf_masks": dec_extras["transf_masks"],
                "enc_masks": enc_masks,
                "masked_objs": masked_objs,
            }

        return output_seq.transpose(0, 1, 4, 2, 3), aux   # NCHW out

    def _cell_params(self) -> CellParams:
        """Learnable physics parameters; unused fields are created frozen
        at zero so the pytree is task-independent."""
        zeros = nn.initializers.zeros

        def p(name, trainable=True):
            del trainable  # freezing handled by the optimizer mask
            return self.param(name, zeros, ())

        if self.cell_type == "spring_ode_cell":
            return CellParams.initial()._replace(
                log_k=p("log_k"), log_equil=p("log_equil"))
        if self.cell_type == "gravity_ode_cell":
            return CellParams.initial()._replace(
                log_g=p("log_g"), log_m=p("log_m", trainable=False))
        return CellParams.initial()


def compute_losses(model: PhysicsNet, inp: jnp.ndarray,
                   output_seq: jnp.ndarray, recons_out: jnp.ndarray,
                   center_penalty=None, vel_anchor_penalty=None,
                   coarse_pred_loss=None, pos_consistency_loss=None,
                   attn_overlap_penalty=None, aux_scale=1.0):
    """Loss definitions, identical to the reference
    (physics_models.py:119-142): squared error summed over (C, H, W),
    meaned over batch/time slices.

    inp: [B, T, C, H, W]; output_seq: [B, pred+extrap, C, H, W];
    recons_out: [B, input+pred, C, H, W].

    Returns (train_loss, dict of eval losses).
    """
    t_in = model.input_steps + model.pred_steps

    recons_target = inp[:, :t_in]
    recons_loss = jnp.sum((recons_target - recons_out) ** 2, axis=(2, 3, 4))
    recons_loss = jnp.mean(recons_loss)

    target = inp[:, model.input_steps:]
    loss = jnp.sum((target - output_seq) ** 2, axis=(2, 3, 4))
    pred_loss = jnp.mean(loss[:, :model.pred_steps])
    extrap_loss = jnp.mean(loss[:, model.pred_steps:])

    pred_weight = aux_scale if model.recons_warmup else 1.0
    # --reference_quirks: the reference's effective training gradient is
    # recons-only (its pred term is a detached stale eval output —
    # reference base.py:142,195); reproduce that gradient path.
    train_pred = (jax.lax.stop_gradient(pred_loss)
                  if model.reference_quirks else pred_loss)
    train_loss = pred_weight * train_pred
    if model.autoencoder_loss > 0.0:
        train_loss = train_loss + model.autoencoder_loss * recons_loss
    # Extension losses, gated by aux_scale (0 during --aux_warmup_epochs:
    # unsupervised object discovery needs the pure reference loss first,
    # or the physics-alignment terms collapse the templates).
    if model.template_center_loss > 0.0 and center_penalty is not None:
        train_loss = train_loss + aux_scale \
            * model.template_center_loss * center_penalty
    if model.vel_anchor > 0.0 and vel_anchor_penalty is not None:
        train_loss = train_loss + aux_scale * model.vel_anchor \
            * vel_anchor_penalty
    if model.coarse_loss > 0.0 and coarse_pred_loss is not None:
        train_loss = train_loss + aux_scale * model.coarse_loss \
            * coarse_pred_loss
    if model.pos_consistency > 0.0 and pos_consistency_loss is not None:
        train_loss = train_loss + aux_scale * model.pos_consistency \
            * pos_consistency_loss
    # Discovery-phase loss: NOT aux_scale-gated (see field note).
    if model.attn_overlap_loss > 0.0 and attn_overlap_penalty is not None:
        train_loss = train_loss + model.attn_overlap_loss \
            * attn_overlap_penalty

    return train_loss, {
        "eval_pred_loss": pred_loss,
        "eval_extrap_loss": extrap_loss,
        "eval_recons_loss": recons_loss,
    }
