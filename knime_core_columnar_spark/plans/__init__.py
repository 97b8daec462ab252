"""Saved/resumable plan persistence (SURVEY.md §2.1 persisted-IR catalog)."""

from knime_core_columnar_spark.plans.persist import Plan, PlanStep

__all__ = ["Plan", "PlanStep"]
