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
