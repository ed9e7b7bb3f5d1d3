"""Fused Pallas local cluster attention (placeholder — round-1 kernel lands
after the end-to-end slice; the dispatcher falls back to the XLA composition).
"""

from __future__ import annotations


def local_cluster_attention_pallas(*args, **kwargs):
    raise NotImplementedError
