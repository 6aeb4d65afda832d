from paig_reproduction_tpu.data.iterators import (  # noqa: F401
    DataIterator,
    get_iterators,
)
