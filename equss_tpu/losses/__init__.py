from equss_tpu.losses.stego import StegoLossConfig, stego_loss, grid_sample  # noqa: F401
from equss_tpu.losses.basic import (  # noqa: F401
    jsd_loss,
    entropy_loss,
    info_nce_loss,
    club_loss,
    margin_ranking_loss,
    jsd_pos_loss,
    proxy_loss,
)
from equss_tpu.losses.sinkhorn import cluster_loss, distributed_sinkhorn  # noqa: F401
