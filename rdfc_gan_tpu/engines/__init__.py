from .base import BaseEngine, GANTrainState, make_optimizer, make_lr_factor_fn
from .rdfc_gan import RDFCGAN
from .rdf_gan import RDFGAN
from ..registry import MODELS


def build_engine(cfg, is_train: bool = True, steps_per_epoch: int = 1):
    """The (missing-in-reference) ``build_model`` factory: dispatch on
    ``cfg.model.type`` (train.py:84-103)."""
    return MODELS.get(cfg.model.type)(cfg, is_train=is_train,
                                      steps_per_epoch=steps_per_epoch)


__all__ = ["BaseEngine", "GANTrainState", "make_optimizer", "make_lr_factor_fn",
           "RDFCGAN", "RDFGAN", "build_engine"]
