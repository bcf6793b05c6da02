from ptyrad_tpu.ops import cplx
from ptyrad_tpu.ops.cplx import Cplx
from ptyrad_tpu.ops.fourier import fft2, fftn3, fftshift2, ifft2, ifftshift2
from ptyrad_tpu.ops.masks import make_gaussian_mask, make_sigmoid_mask
from ptyrad_tpu.ops.shift import fourier_shift
from ptyrad_tpu.ops.patches import extract_patches
from ptyrad_tpu.ops.blur import gaussian_blur_2d, gaussian_blur_1d, gaussian_kernel_1d

__all__ = [
    "cplx",
    "Cplx",
    "fft2",
    "ifft2",
    "fftn3",
    "fftshift2",
    "ifftshift2",
    "make_sigmoid_mask",
    "make_gaussian_mask",
    "fourier_shift",
    "extract_patches",
    "gaussian_blur_2d",
    "gaussian_blur_1d",
    "gaussian_kernel_1d",
]
