"""Mesh sharding: multi-chip/multi-host scaling of decode batches and
SNR-sweep campaigns (SURVEY.md §2.3 — the axis the reference lacks)."""
from .mesh import DATA_AXIS, SNR_AXIS, data_sharding, make_mesh, replicated
from .sim import SimStats, make_sharded_campaign_step, sim_step

__all__ = [
    "DATA_AXIS",
    "SNR_AXIS",
    "SimStats",
    "data_sharding",
    "make_mesh",
    "make_sharded_campaign_step",
    "replicated",
    "sim_step",
]
