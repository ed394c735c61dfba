from .evaluator import TwoScaleEvaluator, two_scale_logits
