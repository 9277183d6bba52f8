from .unet import Unet, NormUnet
from .varnet import VarNet, SensitivityModel
from .stn import SpatialTransformer
from .gan import NetG, NetD, SpectralConv, loss_gan
from .unet_lib import LibUNet, ResNet, Encoder, Decoder
