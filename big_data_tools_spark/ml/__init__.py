from .pipeline import FitResult, evaluate_model, featurize, train_models

__all__ = ["FitResult", "evaluate_model", "featurize", "train_models"]
