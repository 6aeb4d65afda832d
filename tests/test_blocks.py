"""Shape/semantics tests for the neural blocks (SURVEY.md §4 unit tier)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from paig_reproduction_tpu.models import blocks


def _init_apply(module, *args, seed=0):
    rng = jax.random.PRNGKey(seed)
    params = module.init(rng, *args)
    return params, module.apply(params, *args)


class TestUNets:
    def test_shallow_unet_shapes(self):
        m = blocks.ShallowUNet(hidden=8, out_features=2)
        x = jnp.zeros((3, 32, 32, 3))
        _, y = _init_apply(m, x)
        assert y.shape == (3, 32, 32, 2)
        # ShallowUNet has a final ReLU (reference quirk): outputs >= 0
        x2 = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                         jnp.float32)
        _, y2 = _init_apply(m, x2)
        assert float(jnp.min(y2)) >= 0.0

    def test_unet_shapes(self):
        m = blocks.UNet(hidden=16, out_features=2)
        x = jnp.zeros((2, 64, 64, 3))
        _, y = _init_apply(m, x)
        assert y.shape == (2, 64, 64, 2)

    def test_unet_odd_size(self):
        # 36x36 (3bp task) must round-trip through the pooling/resize path
        m = blocks.UNet(hidden=16, out_features=3)
        x = jnp.zeros((2, 36, 36, 3))
        _, y = _init_apply(m, x)
        assert y.shape == (2, 36, 36, 3)


class TestConvolutionalEncoder:
    @pytest.mark.parametrize("img,n_objs", [(32, 2), (64, 2), (36, 3)])
    def test_shapes_and_range(self, img, n_objs):
        m = blocks.ConvolutionalEncoder(input_hw=(img, img), n_objs=n_objs)
        x = jnp.asarray(np.random.RandomState(0).rand(4, img, img, 3),
                        jnp.float32)
        _, (pos, masks, masked) = _init_apply(m, x)
        assert pos.shape == (4, n_objs * 2)
        assert masks.shape == (4, img, img, n_objs + 1)
        assert masked.shape == (n_objs * 4, img, img, 3)
        # coords in [0, img]
        assert float(jnp.min(pos)) >= 0.0
        assert float(jnp.max(pos)) <= img
        # masks softmax-normalized per pixel
        np.testing.assert_allclose(np.asarray(jnp.sum(masks, -1)), 1.0,
                                   atol=1e-5)


class TestVelocityEncoder:
    @pytest.mark.parametrize("alt_vel", [False, True])
    def test_shapes(self, alt_vel):
        m = blocks.VelocityEncoder(alt_vel=alt_vel, input_steps=4, n_objs=2)
        pos = jnp.asarray(np.random.RandomState(0).rand(5, 4, 4),
                          jnp.float32)
        _, v = _init_apply(m, pos)
        assert v.shape == (5, 4)

    def test_object_weight_sharing(self):
        # Folding objects into batch means swapping the two objects'
        # position histories swaps their velocity outputs.
        m = blocks.VelocityEncoder(alt_vel=False, input_steps=3, n_objs=2)
        rs = np.random.RandomState(1)
        pos = jnp.asarray(rs.rand(2, 3, 4), jnp.float32)
        params, v = _init_apply(m, pos)
        swapped = jnp.concatenate([pos[..., 2:], pos[..., :2]], axis=-1)
        v_sw = m.apply(params, swapped)
        np.testing.assert_allclose(
            np.asarray(v_sw),
            np.asarray(jnp.concatenate([v[:, 2:], v[:, :2]], -1)),
            atol=1e-5)


class TestVariableFromNetwork:
    def test_shape_and_determinism(self):
        m = blocks.VariableFromNetwork(shape=(2, 16, 16, 3))
        rng = jax.random.PRNGKey(0)
        params = m.init(rng)
        y1 = m.apply(params)
        y2 = m.apply(params)
        assert y1.shape == (2, 16, 16, 3)
        np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


class TestTorchInitParity:
    def test_dense_init_bounds(self):
        m = blocks.TorchDense(features=50)
        params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 200)))
        k = np.asarray(params["params"]["kernel"])
        bound = 1 / np.sqrt(200)
        assert k.min() >= -bound and k.max() <= bound
        # roughly uniform: std close to bound/sqrt(3)
        assert abs(k.std() - bound / np.sqrt(3)) < 0.15 * bound
