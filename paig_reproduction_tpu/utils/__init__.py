from paig_reproduction_tpu.utils.misc import (  # noqa: F401
    classes_in_module,
    log_metrics,
    rgb2gray,
    zipdir,
)
