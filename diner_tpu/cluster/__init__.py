from diner_tpu.cluster.jobs import JobSpec, to_condor, to_jobset, run_local
from diner_tpu.cluster.specs import SPECS

__all__ = ["JobSpec", "to_condor", "to_jobset", "run_local", "SPECS"]
