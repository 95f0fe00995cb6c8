from . import layers, resnet  # noqa: F401
from .rdf_generator import RDFGenerator  # noqa: F401
from .resnet_generator import ResnetGenerator  # noqa: F401
from .discriminators import PatchGANDiscriminator, PixelGANDiscriminator  # noqa: F401
from .normal_net import NNET  # noqa: F401
from .label_net import PSPNet  # noqa: F401
