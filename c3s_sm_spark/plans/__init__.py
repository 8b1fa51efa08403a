"""Plans: the end-to-end tier pipeline, lineage, and metrics."""

from c3s_sm_spark.plans.pipeline import TIERS, TierPipeline

__all__ = ["TierPipeline", "TIERS"]
