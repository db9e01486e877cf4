from diner_tpu.utils.profiling import trace, benchmark

__all__ = ["trace", "benchmark"]
