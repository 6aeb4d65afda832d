"""Golden test: bilinear upsampling parity with torchvision Resize
(the reference UNet's upsampling path, blocks.py:137,148,160,260,269)."""
import numpy as np
import jax.numpy as jnp
import pytest

from paig_reproduction_tpu.ops.resize import resize_bilinear

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("hw_in,hw_out", [((8, 8), (16, 16)),
                                          ((16, 16), (32, 32)),
                                          ((9, 9), (18, 18)),
                                          ((4, 4), (8, 8))])
def test_upsample_matches_torch_bilinear(hw_in, hw_out):
    rs = np.random.RandomState(0)
    x = rs.rand(2, 3, *hw_in).astype(np.float32)
    # torchvision Resize on tensors delegates to F.interpolate(bilinear,
    # align_corners=False); antialias is irrelevant for upsampling.
    ref = F.interpolate(torch.from_numpy(x), size=hw_out, mode="bilinear",
                        align_corners=False).numpy()
    ours = np.asarray(resize_bilinear(jnp.asarray(x), hw_out))
    np.testing.assert_allclose(ours, ref, atol=1e-5)
