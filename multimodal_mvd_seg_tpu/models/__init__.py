from .unet import PlainConvUNet, ResidualEncoderUNet, PlainConvEncoder, UNetDecoder
from .factory import get_network_from_plans, build_network_and_params
