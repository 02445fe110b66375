from .dice import get_tp_fp_fn_tn, soft_dice_loss, MemoryEfficientSoftDiceLoss
from .compound import DC_and_CE_loss, DC_and_BCE_loss
from .deep_supervision import DeepSupervisionWrapper, deep_supervision_loss
from .robust_ce import cross_entropy_loss, topk_loss
from .distill import (kl_loss_compute1, distill_kl, cc, cc_3d, l2_loss,
                      contrast_loss)
from .contrastive import contrastive_class_to_class_learned_memory
from .feature_memory import (FeatureMemoryState, init_feature_memory,
                             elements_per_class, sample_class_rows,
                             add_features_learned)
from .topo import (Topological_loss, TopoBarcodeLoss, topo_wasserstein,
                   topo_critical_point_loss, topk_barcode_lengths)
from .soft_skeleton import (soft_erode, soft_dilate, soft_open, soft_skel,
                            soft_cldice_loss)
