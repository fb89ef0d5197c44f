from tggcn.utils.itertools import (
    negative_range,
    run_length_encoding,
    run_length_encoding_intervals,
)
from tggcn.utils.metrics import f1_at_k, f1_at_k_single_example
