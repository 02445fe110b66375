from .unet import PlainConvUNet, ResidualEncoderUNet, PlainConvEncoder, UNetDecoder
from .factory import (get_network_from_plans, get_dual_network_from_plans,
                      build_network_and_params)
from .contrastive_net import ContrastiveNet
from .unetrpp import (EPA, TransformerBlock, UnetResBlock, UnetOutBlock,
                      UnetrPPEncoder, UnetrPPEncoderv1, UnetrUpBlock)
