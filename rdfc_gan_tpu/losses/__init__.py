from .gan_loss import (
    GANLoss,
    l1_loss,
    l2_loss,
    mse_loss,
    binary_cross_entropy_loss,
    softmax_cross_entropy_loss,
    norm_normalize,
    nor_loss,
    manhattan_loss,
    gradient_penalty,
)

__all__ = [
    "GANLoss",
    "l1_loss",
    "l2_loss",
    "mse_loss",
    "binary_cross_entropy_loss",
    "softmax_cross_entropy_loss",
    "norm_normalize",
    "nor_loss",
    "manhattan_loss",
    "gradient_penalty",
]
