"""Neural building blocks as flax.linen modules (NHWC, TPU-native).

Capability parity with the reference's ``nn/network/blocks.py``:

* ``ShallowUNet`` / ``UNet``       — reference ``blocks.py:240-308 / 106-237``
* ``ConvolutionalEncoder``         — reference ``blocks.py:52-103``
* ``VelocityEncoder``              — reference ``blocks.py:8-49``
* ``VariableFromNetwork``          — reference ``blocks.py:311-322``

Design notes (TPU-first, not a translation):

* Layout is NHWC throughout (channels on the TPU lane dimension); the
  reference is NCHW. Only the dataset API boundary keeps the reference's
  [B, T, C, H, W] layout.
* Upsampling uses ``jax.image.resize`` bilinear, which matches the
  reference's torchvision Resize (golden-tested in tests/test_resize.py).
* Initializers reproduce torch's Linear/Conv2d defaults
  (kaiming-uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)) for both kernel and
  bias) so convergence behavior is comparable to the reference recipes.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from paig_reproduction_tpu.ops.resize import resize_bilinear


def _uniform_fan_in(bound_from_shape):
    """Returns an initializer drawing U(-b, b) with b computed from shape."""

    def init(key, shape, dtype=jnp.float32):
        b = bound_from_shape(shape)
        return jax.random.uniform(key, shape, dtype, minval=-b, maxval=b)

    return init


# torch Linear default: kernel & bias ~ U(±1/sqrt(fan_in)), kernel shape
# here is (in, out) so fan_in = shape[0].
_dense_kernel_init = _uniform_fan_in(lambda s: 1.0 / np.sqrt(s[0]))
# torch Conv2d default: fan_in = in_ch * kh * kw; flax kernel shape is
# (kh, kw, in_ch, out_ch).
_conv_kernel_init = _uniform_fan_in(lambda s: 1.0 / np.sqrt(s[0] * s[1] * s[2]))


class TorchDense(nn.Module):
    """nn.Dense with torch nn.Linear's default init (kernel and bias).

    ``dtype`` ([extension], None = operate in x.dtype) is the computation
    dtype: params are stored f32 (master weights) and cast per-call, so
    ``bfloat16`` runs the matmul at the MXU's doubled bf16 rate while the
    optimizer state stays full-precision."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / np.sqrt(fan_in)
        kernel = self.param("kernel", _dense_kernel_init,
                            (fan_in, self.features))
        bias = self.param(
            "bias", _uniform_fan_in(lambda s: bound), (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        return x @ kernel + bias


class TorchConv(nn.Module):
    """3x3 (default) SAME conv, NHWC, torch nn.Conv2d default init.

    ``dtype`` as in :class:`TorchDense`: computation dtype, f32 master
    params (flax's nn.Conv casts both operands when dtype is set)."""

    features: int
    kernel_size: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size ** 2
        bound = 1.0 / np.sqrt(fan_in)
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=_conv_kernel_init,
            bias_init=_uniform_fan_in(lambda s: bound),
        )(x)


def _max_pool2(x):
    return nn.max_pool(x, (2, 2), strides=(2, 2))


class ShallowUNet(nn.Module):
    """Two-level UNet for <40px inputs (reference blocks.py:240-308).

    Matches the reference exactly: conv channel progression h/2h/4h, bilinear
    resize upsampling, skip concats, ReLU on the *final* 1x1 conv (a
    reference quirk — the deep UNet has no final ReLU), no ReLU after the
    post-resize convs c7/c10.
    """

    hidden: int = 8
    out_features: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # [N, H, W, C]
        h = self.hidden
        TC = lambda f, **kw: TorchConv(f, dtype=self.dtype, **kw)  # noqa: E731
        height, width = x.shape[1], x.shape[2]
        x = nn.relu(TC(h)(x))
        x1 = nn.relu(TC(h)(x))
        x = _max_pool2(x1)
        x = nn.relu(TC(2 * h)(x))
        x2 = nn.relu(TC(2 * h)(x))
        x = _max_pool2(x2)
        x = nn.relu(TC(4 * h)(x))
        x = nn.relu(TC(4 * h)(x))

        x = resize_bilinear(
            x.transpose(0, 3, 1, 2), (height // 2, width // 2)
        ).transpose(0, 2, 3, 1)
        x = TC(2 * h)(x)
        x = jnp.concatenate([x, x2], axis=-1)
        x = nn.relu(TC(2 * h)(x))
        x = nn.relu(TC(2 * h)(x))

        x = resize_bilinear(
            x.transpose(0, 3, 1, 2), (height, width)
        ).transpose(0, 2, 3, 1)
        x = TC(2 * h)(x)
        x = jnp.concatenate([x, x1], axis=-1)
        x = nn.relu(TC(h)(x))
        x = nn.relu(TC(h)(x))
        x = nn.relu(TC(self.out_features, kernel_size=1)(x))
        return x


class UNet(nn.Module):
    """Three-level UNet for >=40px inputs (reference blocks.py:106-237).

    Channel progression h/2h/4h/8h down, 8h->2h + skips up; no ReLU after
    c9/c12/c15 (the post-resize convs) and none on the final 1x1 conv,
    matching the reference forward exactly.
    """

    hidden: int = 16
    out_features: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x):  # [N, H, W, C]
        h = self.hidden
        TC = lambda f, **kw: TorchConv(f, dtype=self.dtype, **kw)  # noqa: E731
        height, width = x.shape[1], x.shape[2]

        x = nn.relu(TC(h)(x))
        x1 = nn.relu(TC(h)(x))
        x = _max_pool2(x1)

        x = nn.relu(TC(2 * h)(x))
        x2 = nn.relu(TC(2 * h)(x))
        x = _max_pool2(x2)

        x = nn.relu(TC(4 * h)(x))
        x3 = nn.relu(TC(4 * h)(x))
        x = _max_pool2(x3)

        x = nn.relu(TC(8 * h)(x))

        x = nn.relu(TC(8 * h)(x))
        x = resize_bilinear(
            x.transpose(0, 3, 1, 2), (height // 4, width // 4)
        ).transpose(0, 2, 3, 1)
        x = TC(2 * h)(x)

        x = jnp.concatenate([x, x3], axis=-1)          # 2h + 4h = 6h
        x = nn.relu(TC(4 * h)(x))
        x = nn.relu(TC(4 * h)(x))

        x = resize_bilinear(
            x.transpose(0, 3, 1, 2), (height // 2, width // 2)
        ).transpose(0, 2, 3, 1)
        x = TC(2 * h)(x)
        x = jnp.concatenate([x, x2], axis=-1)          # 2h + 2h = 4h
        x = nn.relu(TC(2 * h)(x))
        x = nn.relu(TC(2 * h)(x))

        x = resize_bilinear(
            x.transpose(0, 3, 1, 2), (height, width)
        ).transpose(0, 2, 3, 1)
        x = TC(2 * h)(x)

        x = jnp.concatenate([x, x1], axis=-1)          # 2h + h = 3h
        x = nn.relu(TC(h)(x))
        x = nn.relu(TC(h)(x))
        x = TC(self.out_features, kernel_size=1)(x)
        return x


class ConvolutionalEncoder(nn.Module):
    """UNet attention-mask encoder -> per-object 2D pixel coordinates
    (reference blocks.py:52-103).

    Pipeline: UNet emits one mask logit per object; a constant ones channel
    is appended for the background; softmax over channels; each object mask
    multiplies the input frame; objects are folded into the batch dimension
    for a shared 3-layer MLP coordinate head; output is
    tanh * (W/2) + (W/2), i.e. coordinates in [0, W].

    Returns (positions [N, n_objs*2] object-major [x1,y1,x2,y2,...],
    enc_masks [N, H, W, n_objs+1], masked_objs [n_objs*N, H, W, C]).
    """

    input_hw: Tuple[int, int]
    n_objs: int = 2
    hidden_dim: int = 200
    out_features: int = 2
    # [extension] slot curriculum: only the first `active_slots` object
    # slots participate in the attention softmax (0 = all). Inactive
    # slots' mask logits are driven to -inf (hard gate) so their
    # attention mass goes to the background; parameters keep identical
    # shapes across stages, so staged runs resume from each other's
    # checkpoints.
    active_slots: int = 0
    # [extension] soft variant: subtract this offset from inactive-slot
    # logits instead of -inf. The hard gate freezes inactive UNet output
    # channels (jnp.where passes them zero gradient), so a later stage
    # activates a blind slot (measured: mnist stage 2 never found the
    # second digit); a soft handicap keeps those channels learning while
    # the decoder still hides the slot.
    slot_gate_soft: float = 0.0
    # [extension] computation dtype for the conv stack + hidden MLP
    # (None = f32). With bfloat16 the UNet convs and the wide masked-
    # frame matmuls run at the MXU's doubled bf16 rate; the softmax
    # attention, the final 2-unit coordinate projection and the tanh
    # run f32 so position precision (bf16 eps at x=32 is 0.25 px) and
    # the returned masks are unaffected.
    dtype: object = None

    @nn.compact
    def __call__(self, inp):  # [N, H, W, C]
        n = inp.shape[0]
        height, width = self.input_hw
        small = width < 40
        if small:
            logits = ShallowUNet(8, self.n_objs, dtype=self.dtype)(inp)
        else:
            logits = UNet(16, self.n_objs, dtype=self.dtype)(inp)
        logits = logits.astype(inp.dtype)

        if 0 < self.active_slots < self.n_objs:
            gate = jnp.arange(self.n_objs) < self.active_slots
            gated = (logits - self.slot_gate_soft
                     if self.slot_gate_soft > 0 else
                     jnp.full_like(logits, -1e6))
            logits = jnp.where(gate[None, None, None, :], logits, gated)

        ones = jnp.ones((n, height, width, 1), logits.dtype)
        enc_masks = jax.nn.softmax(
            jnp.concatenate([logits, ones], axis=-1), axis=-1)

        # [n_objs, N, H, W, C]: object-major fold into batch, matching the
        # reference's torch.concat(masked_objs, dim=0) ordering.
        masked = enc_masks[None, ..., :self.n_objs].transpose(4, 0, 1, 2, 3)
        masked = (masked[..., None] * inp[None]).reshape(
            self.n_objs * n, height, width, inp.shape[-1])

        x = masked
        if not small:
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)

        x = nn.relu(TorchDense(self.hidden_dim, dtype=self.dtype)(x))
        x = nn.relu(TorchDense(self.hidden_dim, dtype=self.dtype)(x))
        x = x.astype(inp.dtype)
        x = TorchDense(self.out_features)(x)           # [n_objs*N, 2]

        # unfold objects: [n_objs, N, 2] -> [N, n_objs*2]
        x = x.reshape(self.n_objs, n, self.out_features)
        x = x.transpose(1, 0, 2).reshape(n, self.n_objs * self.out_features)
        x = jnp.tanh(x) * (width / 2) + (width / 2)
        return x, enc_masks, masked


class VelocityEncoder(nn.Module):
    """Initial-velocity estimator from the first ``input_steps`` encoded
    positions (reference blocks.py:8-49).

    Two modes: a per-object MLP over the stacked positions (default), or
    ``alt_vel`` — a learned linear combination of frame-to-frame position
    differences. Objects are folded into the batch dim so weights are
    shared across objects.
    """

    alt_vel: bool
    input_steps: int
    n_objs: int

    @nn.compact
    def __call__(self, pos):  # [B, input_steps, n_objs*2]
        b, s = pos.shape[0], self.input_steps
        o = self.n_objs

        if self.alt_vel:
            h = pos[:, 1:] - pos[:, :-1]               # [B, S-1, o*2]
            h = h.reshape(b, s - 1, o, 2)
            h = h.transpose(2, 0, 1, 3).reshape(o * b, (s - 1) * 2)
            h = TorchDense(2)(h)
        else:
            h = pos.reshape(b, s, o, 2)
            h = h.transpose(2, 0, 1, 3).reshape(o * b, s * 2)
            h = jnp.tanh(TorchDense(100)(h))
            h = jnp.tanh(TorchDense(100)(h))
            h = TorchDense(2)(h)

        return h.reshape(o, b, 2).transpose(1, 0, 2).reshape(b, o * 2)


class VariableFromNetwork(nn.Module):
    """A free variable of arbitrary shape generated by a 2-layer MLP applied
    to a constant ones(1, 10) input — the PAIG trick used for learned object
    templates, contents and background (reference blocks.py:311-322).

    ``init_bias`` ([extension], default None = reference behavior) adds a
    constant array to the output — used for the object-prior template
    initialization (--template_init): the variable starts at the prior
    plus the usual small random MLP output, and the MLP learns deltas
    around it (fully learnable)."""

    shape: Sequence[int]
    init_bias: object = None

    @nn.compact
    def __call__(self):
        x = jnp.ones((1, 10))
        x = jnp.tanh(TorchDense(200)(x))
        x = TorchDense(int(np.prod(self.shape)))(x)
        x = x.reshape(tuple(self.shape))
        if self.init_bias is not None:
            # constant offset: the variable starts at the prior and the
            # (small-init) MLP learns deltas around it
            x = x + jnp.asarray(self.init_bias, x.dtype)
        return x
