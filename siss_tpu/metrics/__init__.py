from siss_tpu.metrics.inception_score import InceptionScore, inception_score_from_logits
from siss_tpu.metrics.classifier import Classifier
from siss_tpu.metrics.tshirt import TShirtClassifier
from siss_tpu.metrics.membership import MembershipLoss
from siss_tpu.metrics.fid import FIDEvaluator, frechet_distance

__all__ = [
    "InceptionScore",
    "inception_score_from_logits",
    "Classifier",
    "TShirtClassifier",
    "MembershipLoss",
    "FIDEvaluator",
    "frechet_distance",
]
