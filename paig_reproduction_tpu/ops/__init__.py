from paig_reproduction_tpu.ops import cells, stn, resize  # noqa: F401
