from gpemsr_tpu.ops.resize import resize_bilinear, interpolate, resize_trilinear
from gpemsr_tpu.ops.warp import flow_warp, grid_sample_bilinear
from gpemsr_tpu.ops.pixel_shuffle import pixel_shuffle, pixel_unshuffle
from gpemsr_tpu.ops.patches import extract_patches, same_padding_reflect
from gpemsr_tpu.ops.dcn import deform_conv2d, torch_weight_to_dcn
from gpemsr_tpu.ops.vq import quantize, nearest_code, lookup_logits
from gpemsr_tpu.ops.contextual import contextual_loss
