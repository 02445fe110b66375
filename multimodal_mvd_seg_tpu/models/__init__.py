from .unet import PlainConvUNet, ResidualEncoderUNet, PlainConvEncoder, UNetDecoder
from .factory import (get_network_from_plans, get_dual_network_from_plans,
                      get_CSNet_from_plans, get_wingsnet_from_plans,
                      build_network_and_params)
from .contrastive_net import ContrastiveNet
from .unetrpp import (EPA, TransformerBlock, UnetResBlock, UnetOutBlock,
                      UnetrPPEncoder, UnetrPPEncoderv1, UnetrUpBlock)
from .attn_decoders import (Attention, Cross_Attention, Self_Attention,
                            CrossWindowAttention3D, AttnUNetDecoderBase,
                            UNetDecoder5Wrapper)
from .selfattn_net import (SelfAttnNetv1, SelfAttnNetv2, SelfAttnNetv3,
                           SelfAttnNetv4, FinalNetv1, FinalNetv2, FinalNetv3,
                           FinalNetv4, Fusion_layer)
from .hybrid_net import (EnhancedFeature, HybridNet, HybridNet_v1,
                         HybridNet_v2, HybridNet_v3, HybridNet_v4,
                         HybridNet_v5, HybridNet_v6)
from .csnet_wingsnet import CSNet3D, WingsNet
from .hdenseformer import (DenseForward, Dense_Attention,
                           DensePreConv_AttentionBlock,
                           Dense_TransformerBlock)
