from equss_tpu.utils.visualize import visualization, pq_visualization  # noqa: F401
