from . import layers, resnet  # noqa: F401
from .rdf_generator import RDFGenerator  # noqa: F401
from .resnet_generator import ResnetGenerator  # noqa: F401
from .discriminators import (PatchGANDiscriminator,  # noqa: F401
                             PixelGANDiscriminator,
                             PointNetDiscriminator)
from .normal_net import NNET  # noqa: F401
from .label_net import PSPNet  # noqa: F401
from .esanet import ESANet, ESANetOneModality  # noqa: F401
from .dcv_gan_generator import DCVGANGenerator  # noqa: F401
from .dcv_gan_generator_vanilla import DCVGANGeneratorVanilla  # noqa: F401
