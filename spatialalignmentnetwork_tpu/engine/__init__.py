from .config import Config
from .checkpoint import ckpt_save, ckpt_load
from .csmodel import CSModel
