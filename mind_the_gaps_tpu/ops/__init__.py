"""Hand-written TPU kernels (Pallas) for the hot ops."""
from mind_the_gaps_tpu.ops.pallas_celerite import pallas_log_likelihood

__all__ = ["pallas_log_likelihood"]
