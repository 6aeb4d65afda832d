"""Drop-in equivalent of the reference's ``runners/torch_run_physics.py``:
same flags, same task table, TPU-native backend."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.realpath(__file__)),
                                ".."))

from paig_reproduction_tpu.cli import main  # noqa: E402

if __name__ == "__main__":
    main()
