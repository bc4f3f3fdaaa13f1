from ctr_recommendation_tpu.utils.seeding import set_seed
from ctr_recommendation_tpu.utils.profiling import StepTimer, trace

__all__ = ["StepTimer", "set_seed", "trace"]
