"""Pallas TPU kernels — the native tier for hot compute paths."""
from collie_tpu.ops.pallas.retrieval_kernel import mf_topk_retrieve

__all__ = ['mf_topk_retrieve']
