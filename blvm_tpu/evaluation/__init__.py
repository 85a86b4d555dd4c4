from blvm_tpu.evaluation.metrics import (
    BitsPerDimMetric,
    ConfusionMatrixMetric,
    EMAMetric,
    ErrorRateMetric,
    KLMetric,
    LatestMeanMetric,
    LLMetric,
    LossMetric,
    Metric,
    PerplexityMetric,
    RunningAccuracyMetric,
    RunningMeanMetric,
    RunningVarianceMetric,
)
from blvm_tpu.evaluation.tracker import Tracker
