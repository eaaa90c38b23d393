from .bpr import BprSamplerData, sample_batch, make_sampler_data

__all__ = ["BprSamplerData", "sample_batch", "make_sampler_data"]
