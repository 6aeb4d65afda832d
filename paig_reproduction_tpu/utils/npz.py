"""Fast .npz writer.

`np.savez_compressed` hardwires zlib's default level (6), which costs
~6.3 s for the ~74 MB float32 input dump the eval loop writes every eval
(reference artifact, reference nn/network/base.py:212-214) — on this
host that is the dominant eval cost. Level-1 deflate produces the same
standard npz container (np.load-compatible, same member names, within
~0.2% of the size on this data) ~6x faster.
"""
import zipfile

import numpy as np


def savez_fast(path, **arrays):
    """Write a standard .npz (ZIP of .npy members, deflate level 1).

    Drop-in for np.savez_compressed(path, **arrays): identical container
    format and member layout, only the deflate effort differs.
    """
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED,
                         compresslevel=1) as z:
        for name, arr in arrays.items():
            with z.open(name + ".npy", "w", force_zip64=True) as f:
                np.lib.format.write_array(f, np.asanyarray(arr),
                                          allow_pickle=False)
