from equss_tpu.eval.probes import (  # noqa: F401
    LinearProbe,
    ClusterProbe,
    Evaluator,
    EvaluatorConfig,
)
from equss_tpu.eval.metrics import UnSegMetrics, confusion_update  # noqa: F401
