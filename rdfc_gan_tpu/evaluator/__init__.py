from .evaluator import Eval

__all__ = ["Eval"]
