"""Utils contract tests: log.txt line format, gallery tiling layout,
code.zip snapshot, reflection registry, gray conversion.

These pin the *artifact/byte contracts* the reference's downstream tooling
relies on (reference nn/utils/misc.py, nn/utils/viz.py) without sharing the
reference's code.
"""
import logging
import zipfile

import numpy as np

from paig_reproduction_tpu.utils import misc, viz


def test_log_metrics_format_byte_exact():
    records = []

    class Grab(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    logger = logging.getLogger("test_log_metrics")
    logger.setLevel(logging.INFO)
    logger.addHandler(Grab())
    misc.log_metrics(logger, "epoch=3 it=7",
                     {"b_loss": 1.5, "a_loss": np.float32(0.25)})
    # Reference format (misc.py:6-9): prefix, space, sorted "k=v" joined
    # by single spaces, values via str().
    assert records == [
        f"epoch=3 it=7 a_loss={np.float32(0.25)} b_loss=1.5"]


def test_gallery_matches_naive_tiling():
    rng = np.random.RandomState(0)
    arr = rng.rand(6, 4, 5, 3)

    out = viz.gallery(arr, ncols=3)

    # Naive oracle: frame each tile with a 1-px 0.5 border, lay out
    # row-major in a 2x3 grid.
    th, tw = 4 + 2, 5 + 2
    expect = np.zeros((2 * th, 3 * tw, 3))
    for i in range(6):
        r, c = divmod(i, 3)
        tile = 0.5 * np.ones((th, tw, 3))
        tile[1:-1, 1:-1] = arr[i]
        expect[r * th:(r + 1) * th, c * tw:(c + 1) * tw] = tile
    np.testing.assert_array_equal(out, expect)


def test_zipdir_snapshots_py_sources(tmp_path):
    src = tmp_path / "proj"
    (src / "sub").mkdir(parents=True)
    (src / "a.py").write_text("x = 1\n")
    (src / "sub" / "b.py").write_text("y = 2\n")
    (src / "skip.txt").write_text("not python\n")
    out_dir = tmp_path / "run"
    out_dir.mkdir()

    misc.zipdir(str(src), str(out_dir))

    with zipfile.ZipFile(out_dir / "code.zip") as zf:
        names = sorted(zf.namelist())
    # Paths are relative to the *parent* of the snapshotted dir
    # (reference misc.py:27-31 arcname convention).
    assert names == ["proj/a.py", "proj/sub/b.py"]


def test_classes_in_module_only_local_defs():
    from paig_reproduction_tpu.models import registry as mod

    found = misc.classes_in_module(mod)
    assert all(cls.__module__ == mod.__name__ for cls in found.values())
    assert "PhysicsNet" not in found  # imported, not defined there


def test_rgb2gray_luma_weights():
    img = np.zeros((2, 2, 3))
    img[..., 0] = 1.0
    np.testing.assert_allclose(misc.rgb2gray(img), 0.299)
    img = np.ones((4, 3))
    np.testing.assert_allclose(misc.rgb2gray(img),
                               np.full(4, 0.299 + 0.587 + 0.114))
