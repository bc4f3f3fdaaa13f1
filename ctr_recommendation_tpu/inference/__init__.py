from ctr_recommendation_tpu.inference.pipeline import run_submission_pipeline
from ctr_recommendation_tpu.inference.predictor import Predictor
from ctr_recommendation_tpu.inference.submission import write_submission

__all__ = ["Predictor", "run_submission_pipeline", "write_submission"]
