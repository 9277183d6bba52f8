from .fft import fft2, ifft2, fftshift2, ifftshift2, rss
from .crop import center_crop
