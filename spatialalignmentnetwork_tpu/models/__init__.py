from .unet import Unet, NormUnet
from .varnet import VarNet, SensitivityModel
from .stn import SpatialTransformer
from .gan import NetG, NetD, loss_gan
