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
        template_raw = VariableFromNetwork(
            (self.n_objs, self.tmpl_size, self.tmpl_size),
            name="var_net_template")()
        assets = DecoderAssets(
            template=template_raw,
            contents=contents_raw,
            background=jax.nn.sigmoid(background_raw),
        )

        # --- encode input+pred frames (batch and time flattened) ----------
        frames = x[:, :t_in].reshape(b * t_in, img, img, ch)
        enc_pos_flat, enc_masks, masked_objs = ConvolutionalEncoder(
            input_hw=(img, img), n_objs=self.n_objs, hidden_dim=200,
            out_features=2, name="encoder")(frames)

        # --- autoencoder path ---------------------------------------------
        recons_flat, _ = st_decode(assets, enc_pos_flat, cfg)
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

        pos = enc_pos[:, self.input_steps - 1]

        # --- rollout: fused cell + decode scan ------------------------------
        n_steps = self.pred_steps + self.extrap_steps

        if self.cell_type == "lstm":
            # Properly-wired black-box baseline (the reference exposes the
            # flags but never wires the LSTM path; SURVEY.md §2.1). An
            # LSTM cell consumes [pos, vel] and predicts the next state.
            lstm = nn.OptimizedLSTMCell(self.recurrent_units, name="lstm")
            proj = TorchDense(self.coord_units, name="lstm_proj")
            carry = lstm.initialize_carry(
                jax.random.PRNGKey(0), (b, self.coord_units))
            outs, pos_vels = [], [jnp.concatenate([pos, vel], axis=1)]
            for _ in range(n_steps):
                carry, hid = lstm(carry, jnp.concatenate([pos, vel], axis=1))
                pv = proj(hid)
                pos, vel = jnp.split(pv, 2, axis=1)
                out, _ = st_decode(assets, pos, cfg)
                outs.append(out)
                pos_vels.append(jnp.concatenate([pos, vel], axis=1))
            output_seq = jnp.stack(outs, axis=1)
            pos_vel_seq = jnp.stack(pos_vels, axis=1)
        else:
            step_fn, dt = cells.CELLS[self.cell_type]
            cell_params = self._cell_params()

            def body(carry, _):
                p, v = carry
                p, v = step_fn(cell_params, p, v, dt)
                frame, _ = st_decode(assets, p, cfg)
                return (p, v), (frame, jnp.concatenate([p, v], axis=1))

            (_, _), (output_seq, pos_vel_roll) = jax.lax.scan(
                body, (pos, vel), None, length=n_steps)
            # scan stacks on axis 0 (time): -> [B, T, ...]
            output_seq = jnp.moveaxis(output_seq, 0, 1)
            pos_vel_seq = jnp.concatenate(
                [jnp.concatenate([pos, vel], axis=1)[:, None],
                 jnp.moveaxis(pos_vel_roll, 0, 1)], axis=1)

        aux: Dict[str, Any] = {
            "recons_out": recons_out.transpose(0, 1, 4, 2, 3),  # NCHW out
            "enc_pos": enc_pos,
            "pos_vel_seq": pos_vel_seq,
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
                   output_seq: jnp.ndarray, recons_out: jnp.ndarray):
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

    train_loss = pred_loss
    if model.autoencoder_loss > 0.0:
        train_loss = train_loss + model.autoencoder_loss * recons_loss

    return train_loss, {
        "eval_pred_loss": pred_loss,
        "eval_extrap_loss": extrap_loss,
        "eval_recons_loss": recons_loss,
    }
