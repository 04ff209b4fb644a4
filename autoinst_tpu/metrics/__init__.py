"""Research metrics (host-side numpy, bit-for-bit reference semantics)."""

from autoinst_tpu.metrics.instance_metrics import InstanceMetrics
from autoinst_tpu.metrics.s_assoc import SAssocEvaluator
