"""Inference tier: rejection-sampling generation and teacher scoring."""

from lunaris_orion_tpu.infer.generator import ImageGenerator  # noqa: F401
from lunaris_orion_tpu.infer.evaluator import QualityEvaluator  # noqa: F401
from lunaris_orion_tpu.infer.exporter import (  # noqa: F401
    ServingBundle, export_serving_bundle)
