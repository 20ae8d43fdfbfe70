from gpemsr_tpu.seg.affinity import (
    gen_seg_malis, mknhood3d, seg_to_aff, seg_widen_border, weight_binary_ratio,
)
from gpemsr_tpu.seg.metrics import adapted_rand_error, variation_of_information
from gpemsr_tpu.seg.watershed import randomlabel, relabel, remove_small, watershed
