from equss_tpu.data.synthetic import synthetic_batches  # noqa: F401
