"""Contract tests for the C++ prefetching data loader vs the Python
DataIterator semantics it mirrors."""
import numpy as np
import pytest

native = pytest.importorskip("paig_reproduction_tpu.data.native")


@pytest.fixture(scope="module")
def lib_ok():
    try:
        native._load_lib()
    except native.NativeLoaderUnavailable as e:
        pytest.skip(f"native loader unavailable: {e}")


def test_shapes_normalization_and_determinism(lib_ok):
    rs = np.random.RandomState(0)
    data = rs.randint(0, 255, (13, 2, 3, 4, 4), dtype=np.uint8)
    b = native.NativeBatcher(data, batch_size=4, seed=1)
    x = b.next_batch_x()
    assert x.shape == (4, 2, 3, 4, 4)
    assert x.dtype == np.float32
    assert 0.0 <= x.min() and x.max() <= 1.0
    # every batch row must be an exact row of data/255
    flat = data.reshape(13, -1).astype(np.float32) / 255.0
    for row in x.reshape(4, -1):
        assert any(np.array_equal(row, fr) for fr in flat)


def test_epoch_counting_and_coverage(lib_ok):
    n, bs = 12, 4
    data = np.arange(n, dtype=np.uint8).reshape(n, 1, 1) * np.ones(
        (1, 2, 2), np.uint8)
    b = native.NativeBatcher(data, batch_size=bs, seed=3, normalize=False)
    seen = []
    # epoch 0: 3 batches; counter goes 0, 0, 1 (reference semantics:
    # increments when the NEXT batch would overrun)
    epochs = []
    for _ in range(3):
        x = b.next_batch_x()
        seen.extend(int(v) for v in x[:, 0, 0])
        epochs.append(b.epochs_completed)
    assert epochs == [0, 0, 1]
    # full coverage without replacement within the epoch
    assert sorted(seen) == list(range(n))


def test_batch_larger_than_dataset_rejected(lib_ok):
    data = np.zeros((3, 2, 2), np.uint8)
    with pytest.raises(native.NativeLoaderUnavailable):
        native.NativeBatcher(data, batch_size=8)


def test_many_epochs_reshuffle(lib_ok):
    n, bs = 8, 4
    data = np.arange(n, dtype=np.uint8).reshape(n, 1)
    b = native.NativeBatcher(data, batch_size=bs, seed=5, normalize=False)
    orders = []
    for _ in range(4):  # 2 epochs
        orders.append(tuple(int(v) for v in b.next_batch_x()[:, 0]))
    ep0 = orders[0] + orders[1]
    ep1 = orders[2] + orders[3]
    assert sorted(ep0) == list(range(n))
    assert sorted(ep1) == list(range(n))
    assert ep0 != ep1  # reshuffled between epochs (w.h.p.)
