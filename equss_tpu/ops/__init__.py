from equss_tpu.ops.quantizer import (  # noqa: F401
    PQConfig,
    pq_init,
    pq_forward,
    pairwise_sqdist,
    normalize_vectors,
)
