from gpemsr_tpu.utils.image import read_img, save_img, tensor2img
from gpemsr_tpu.utils.metrics import calculate_psnr, calculate_ssim
from gpemsr_tpu.utils.precision import bf16_inference, bf16_params, cast_floats
