from diner_tpu.utils.profiling import trace, benchmark

__all__ = ["trace", "benchmark"]

from diner_tpu.utils.stats import weighted_mean_and_std  # noqa: E402

__all__.append("weighted_mean_and_std")
