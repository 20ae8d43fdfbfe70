from gpemsr_tpu.models.seg.superhuman import UNetSuperhuman
from gpemsr_tpu.models.seg.mala import UNetMALA
from gpemsr_tpu.models.seg.unetr import UNETR, ViT3D
