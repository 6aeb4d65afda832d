"""utils/npz.savez_fast: exact npz-container parity with
np.savez_compressed (reference artifact contract, reference
nn/network/base.py:212-214) at a fraction of the deflate cost."""
import io
import zipfile

import numpy as np

from paig_reproduction_tpu.utils.npz import savez_fast


def test_roundtrip_and_member_parity(tmp_path):
    rs = np.random.RandomState(0)
    inputs = (rs.randint(0, 255, (7, 3, 2, 4, 4)).astype(np.float32)
              / 255.0)
    outputs = rs.rand(3, 3).astype(np.float32)

    fast = tmp_path / "fast.npz"
    savez_fast(str(fast), input=inputs, output=outputs)
    ref = tmp_path / "ref.npz"
    np.savez_compressed(str(ref), input=inputs, output=outputs)

    with np.load(str(fast)) as d, np.load(str(ref)) as r:
        assert sorted(d.files) == sorted(r.files) == ["input", "output"]
        np.testing.assert_array_equal(d["input"], inputs)
        np.testing.assert_array_equal(d["output"], outputs)

    # same container: ZIP of .npy members, deflate-compressed
    with zipfile.ZipFile(str(fast)) as z:
        assert sorted(z.namelist()) == ["input.npy", "output.npy"]
        assert all(i.compress_type == zipfile.ZIP_DEFLATED
                   for i in z.infolist())


def test_rejects_object_arrays(tmp_path):
    import pytest
    arr = np.array([{"a": 1}], dtype=object)
    with pytest.raises(ValueError):
        savez_fast(str(tmp_path / "x.npz"), bad=arr)
