from equss_tpu.core.config import (  # noqa: F401
    load_config,
    override_config_by_cli,
    prepare_config,
    resolve_config,
)
