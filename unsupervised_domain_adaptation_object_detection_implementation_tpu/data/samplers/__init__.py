from .two_stream import TwoStreamBatchSampler, GroupBatchSampler

__all__ = ['TwoStreamBatchSampler', 'GroupBatchSampler']
