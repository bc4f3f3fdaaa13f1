from ctr_recommendation_tpu.inference.predictor import Predictor
from ctr_recommendation_tpu.inference.submission import write_submission

__all__ = ["Predictor", "write_submission"]
