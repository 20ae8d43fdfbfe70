from gpemsr_tpu.infer.sr import sr_stack, window_indices
from gpemsr_tpu.infer.tiled3d import TileProtocol, gaussian_weight, tiled_infer
from gpemsr_tpu.infer.spatial import spatial_sr
