"""Parity: the fused Pallas ST-decoder kernel (interpret mode on CPU) must
match the XLA separable-matmul decoder, which is itself golden-tested
against torch grid_sample."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paig_reproduction_tpu.models.decoder import (
    DecoderAssets,
    DecoderConfig,
    st_decode,
)
from paig_reproduction_tpu.ops.pallas.st_decoder import st_decode_pallas


@pytest.mark.parametrize("img,tmpl,n_objs,n", [(32, 16, 2, 10),
                                               (36, 18, 3, 7)])
def test_pallas_matches_xla_decoder(img, tmpl, n_objs, n):
    rs = np.random.RandomState(0)
    ch = 3
    assets = DecoderAssets(
        template=jnp.asarray(rs.randn(n_objs, tmpl, tmpl), jnp.float32),
        contents=jnp.asarray(rs.randn(n_objs, tmpl, tmpl, ch), jnp.float32),
        background=jnp.asarray(rs.rand(img, img, ch), jnp.float32),
    )
    cfg = DecoderConfig(img_hw=(img, img), tmpl_size=tmpl, n_objs=n_objs,
                        conv_ch=ch, log_sig=1.0)
    pos = jnp.asarray(rs.rand(n, n_objs * 2) * img, jnp.float32)

    ref, _ = st_decode(assets, pos, cfg)

    joint = jnp.concatenate(
        [assets.template[..., None] + 5.0,
         jax.nn.sigmoid(assets.contents)], axis=-1)
    out = st_decode_pallas(pos, joint, assets.background, img=img,
                           tmpl=tmpl, n_objs=n_objs, ch=ch, sigma=1.0,
                           b_tile=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_pallas_large_logits_safe():
    # The softmax must not overflow for large template logits.
    img, tmpl, n_objs, ch, n = 32, 16, 2, 3, 4
    rs = np.random.RandomState(1)
    joint = jnp.concatenate(
        [jnp.full((n_objs, tmpl, tmpl, 1), 90.0),
         jnp.asarray(rs.rand(n_objs, tmpl, tmpl, ch), jnp.float32)],
        axis=-1)
    bg = jnp.asarray(rs.rand(img, img, ch), jnp.float32)
    pos = jnp.asarray(rs.rand(n, n_objs * 2) * img, jnp.float32)
    out = st_decode_pallas(pos, joint, bg, img=img, tmpl=tmpl,
                           n_objs=n_objs, ch=ch, interpret=True)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.slow
def test_backend_flag_forward_and_grad_parity():
    """st_decode(backend="pallas") (custom_vjp: kernel fwd, XLA bwd) must
    match the XLA path in value AND gradients, including through the
    PhysicsNet-style composition over template/contents/background/pos."""
    img, tmpl, n_objs, ch, n = 32, 16, 2, 3, 6
    rs = np.random.RandomState(2)
    assets = DecoderAssets(
        template=jnp.asarray(rs.randn(n_objs, tmpl, tmpl), jnp.float32),
        contents=jnp.asarray(rs.randn(n_objs, tmpl, tmpl, ch),
                             jnp.float32),
        background=jnp.asarray(rs.rand(img, img, ch), jnp.float32),
    )
    cfg = DecoderConfig(img_hw=(img, img), tmpl_size=tmpl, n_objs=n_objs,
                        conv_ch=ch, log_sig=1.0)
    pos = jnp.asarray(rs.rand(n, n_objs * 2) * img, jnp.float32)
    tgt = jnp.asarray(rs.rand(n, img, img, ch), jnp.float32)

    def loss(backend, t, c, b, p):
        out, _ = st_decode(DecoderAssets(t, c, b), p, cfg,
                           backend=backend)
        return jnp.sum((out - tgt) ** 2)

    args = (assets.template, assets.contents, assets.background, pos)
    ref_val, ref_grads = jax.value_and_grad(
        lambda *a: loss("xla", *a), argnums=(0, 1, 2, 3))(*args)
    pal_val, pal_grads = jax.value_and_grad(
        lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(*args)

    np.testing.assert_allclose(float(pal_val), float(ref_val), rtol=1e-5)
    for g_ref, g_pal in zip(ref_grads, pal_grads):
        np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5)


def test_model_runs_with_pallas_backend():
    """PhysicsNet(decoder_backend="pallas") trains a step on the emulated
    mesh (interpret mode) and matches the xla-backend forward."""
    from paig_reproduction_tpu.models import PhysicsNet

    rs = np.random.RandomState(3)
    inp = jnp.asarray(rs.rand(2, 12, 3, 32, 32), jnp.float32)
    kw = dict(task="spring_color", cell_type="spring_ode_cell",
              seq_len=12, input_steps=4, pred_steps=6,
              autoencoder_loss=3.0, color=True, input_size=32 * 32)
    m_x = PhysicsNet(decoder_backend="xla", **kw)
    m_p = PhysicsNet(decoder_backend="pallas", **kw)
    params = m_x.init(jax.random.PRNGKey(0), inp)
    out_x, _ = m_x.apply(params, inp)
    out_p, _ = m_p.apply(params, inp)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-5)
