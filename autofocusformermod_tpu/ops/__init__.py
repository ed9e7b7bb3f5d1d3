from .clusten import (
    cluster_qk,
    cluster_av,
    cluster_wf,
    weighted_gather,
    msdetrpc,
)

__all__ = ["cluster_qk", "cluster_av", "cluster_wf", "weighted_gather", "msdetrpc"]
