from equss_tpu.analysis.codebook import (  # noqa: F401
    per_class_codeword_entropy,
    inter_class_similarity,
    codebook_usage_heatmap,
    dino_correspondence,
)
