from gns_tpu.ops.segment import (  # noqa: F401
    segment_sum,
    gather,
    incidence_matrix,
)
