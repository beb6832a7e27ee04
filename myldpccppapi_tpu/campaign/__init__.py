"""Resumable BER/FER waterfall campaigns (SURVEY.md §5: the checkpoint /
metrics machinery the reference lacks)."""
from .waterfall import CampaignConfig, PointStats, WaterfallCampaign

__all__ = ["CampaignConfig", "PointStats", "WaterfallCampaign"]
